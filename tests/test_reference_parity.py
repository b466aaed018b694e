"""Golden parity: our kernel vs the reference implementation, field by field.

The north-rule invariant is byte-identical extracted text per url. We run
the reference's `parse_avc_log` (rich stubbed, no code copied) and our
pandas kernel on IDENTICAL payload blocks — both the synthetic corpus and
the reference's own testAVC curated logs — and assert equality of every
extracted field.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from avc_parser_spark.datagen.payload import make_payload, route_for
from avc_parser_spark.parse.kernels import parse_pages_pdf
from tests.reference_loader import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")

# field mapping ours ← reference avc_data key
FIELD_MAP = {
    "permission": "permission",
    "pid": "pid",
    "comm": "comm",
    "exe": "exe",
    "path": "path",
    "path_type": "path_type",
    "tclass": "tclass",
    "dest_port": "dest_port",
    "dbus_dest": "dbus_dest",
    "permissive": "permissive",
    "syscall": "syscall",
    "exit": "exit",
    "success": "success",
    "proctitle": "proctitle",
    "execve_cmdline": "execve_cmdline",
    "dev": "dev",
    "ino": "ino",
    "cwd": "cwd",
    "saddr": "saddr",
    "host": "host",
}


def _ref_parse_blocks(text: str) -> list[dict]:
    """Run the reference per block exactly as its main() does
    (split on ---- then parse_avc_log per block)."""
    out = []
    for blk in text.split("----"):
        blk = blk.strip()
        if not blk:
            continue
        denials, _unparsed = ref.parse_avc_log(blk)
        out.extend(denials)
    return out


def _our_parse(urls_texts: list[tuple[str, str]]) -> pd.DataFrame:
    pdf = pd.DataFrame(
        {
            "url": [u for u, _ in urls_texts],
            "warc_ts": [pd.Timestamp("2025-09-04")] * len(urls_texts),
            "text": [t for _, t in urls_texts],
            "lang": ["en"] * len(urls_texts),
        }
    )
    return parse_pages_pdf(pdf)


def _norm(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return str(v)


def _compare_doc(url: str, text: str, ours: pd.DataFrame) -> list[str]:
    """Compare reference vs our rows for one doc; return mismatch strings."""
    ref_rows = _ref_parse_blocks(text)
    our_rows = ours[(ours["url"] == url) & (ours["route"] == "parse_ok")]
    errs = []
    if len(ref_rows) != len(our_rows):
        return [f"{url}: row count ref={len(ref_rows)} ours={len(our_rows)}"]
    # align by event order (both follow input order within a doc)
    our_sorted = our_rows.sort_values("event_id").reset_index(drop=True)
    ref_sorted = sorted(
        ref_rows, key=lambda d: str(d.get("event_id") or "")
    )
    for i, rd in enumerate(ref_sorted):
        for ours_f, ref_f in FIELD_MAP.items():
            rv = rd.get(ref_f)
            if hasattr(rv, "type"):  # AvcContext object
                rv = str(rv)
            ov = our_sorted.iloc[i][ours_f]
            if _norm(ov) != _norm(rv):
                errs.append(f"{url} [{i}].{ours_f}: ref={rv!r} ours={ov!r}")
        # contexts: compare raw strings
        for side, ref_key in (("scontext_raw", "scontext"), ("tcontext_raw", "tcontext")):
            rv = rd.get(ref_key)
            rv = str(rv) if rv is not None else None
            ov = our_sorted.iloc[i][side]
            if _norm(ov) != _norm(rv):
                errs.append(f"{url} [{i}].{side}: ref={rv!r} ours={ov!r}")
        # timestamp (reference datetime_obj is local-tz; container is UTC)
        rv = rd.get("datetime_obj")
        ov = our_sorted.iloc[i]["event_ts"]
        if rv is not None and pd.notna(ov):
            if pd.Timestamp(rv) != pd.Timestamp(ov):
                errs.append(f"{url} [{i}].event_ts: ref={rv} ours={ov}")
    return errs


def test_parity_synthetic_corpus():
    docs = []
    for i in range(400):
        if route_for(i) != "parse_ok":
            continue
        text, _ = make_payload(i)
        docs.append((f"doc{i}", text))
    ours = _our_parse(docs)
    errors = []
    for url, text in docs:
        errors.extend(_compare_doc(url, text, ours))
    assert not errors, "\n".join(errors[:25]) + f"\n... {len(errors)} total"


# EVERY .log in the reference's own curated corpus (discovered at collect
# time so new reference fixtures are picked up automatically)
_CORPUS_DIR = "/root/reference/testAVC"
CORPUS_FILES = sorted(
    f for f in (os.listdir(_CORPUS_DIR) if os.path.isdir(_CORPUS_DIR) else [])
    if f.endswith(".log")
)


@pytest.mark.parametrize("fname", CORPUS_FILES)
def test_parity_reference_corpus(fname):
    path = os.path.join("/root/reference/testAVC", fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} not in corpus")
    text = open(path, encoding="utf-8", errors="replace").read()
    ours = _our_parse([(fname, text)])
    errors = _compare_doc(fname, text, ours)
    assert not errors, "\n".join(errors[:25]) + f"\n... {len(errors)} total"
