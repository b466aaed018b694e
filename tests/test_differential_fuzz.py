"""Differential fuzzing: our kernel vs the reference on adversarial blocks.

A seeded generator produces audit blocks with randomized quoting, field
order, missing fields, junk tokens, unicode, and edge values; every field
the reference extracts must match ours exactly. This is the byte-exactness
insurance that lets future kernel refactors (e.g. combined regex passes)
land safely.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from avc_parser_spark.parse.kernels import parse_pages_pdf
from tests.reference_loader import load_reference
from tests.test_reference_parity import FIELD_MAP, _norm

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")

PERMS = ["read", "write", "open", "getattr", "name_connect", "signal",
         "read write", "dac_override", "noatsecure"]
COMMS = ['"httpd"', "httpd", '"web server"', '"python3"', "unconfined"]
PATHS = [
    '"/var/www/html/a.html"', '"/proc/123/fd"', '"/proc/999/maps"',
    '"pipe:[777]"', '"/tmp/x y"', "/unquoted/path", '"été.txt"',
    None,
]
CONTEXTS = [
    "system_u:system_r:httpd_t:s0",
    "unconfined_u:unconfined_r:unconfined_t:s0-s0:c0.c1023",
    "a:b:c",
    "sys:obj:etc_t:s15:c1,c3.c5",
    "invalidcontext",
]
TCLASSES = ["file", "dir", "tcp_socket", "process", "capability", "dbus"]


def gen_block(rng: random.Random) -> str:
    serial = rng.randint(1, 10_000_000)
    if rng.random() < 0.25:
        # interpreted ausearch -i form, sometimes with the `) :` spacing
        # seen in real exports (network_AVC.log)
        mm, dd = rng.randint(1, 12), rng.randint(1, 28)
        ts = f"{mm:02d}/{dd:02d}/2025 {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}.{rng.randint(0, 999):03d}"
        aud = f"audit({ts}:{serial})"
    else:
        ts = f"{rng.randint(1_000_000_000, 1_900_000_000)}.{rng.randint(0, 999):03d}"
        aud = f"audit({ts}:{serial})"
    lines = []

    if rng.random() < 0.4:
        # NB control bytes (raw NUL argv separators) are deliberately only
        # emitted hex-encoded: the reference CLI sanitizes control bytes and
        # parses on, while this pipeline routes binary-corrupted payloads to
        # quarantine (FIXTURES.md §3) — a documented routing divergence
        # covered by dedicated kernel tests, not by this parity fuzzer.
        argv = rng.choice(
            ["/usr/sbin/httpd\x00-D", "/bin/x", "e9" * rng.choice([8, 128]),
             "/usr/sbin/httpd\x00"]  # trailing NUL: strict path keeps ' ' suffix
        )
        pt = argv.encode(errors="replace").hex().upper() if "\x00" in argv or rng.random() < 0.7 else argv
        if rng.random() < 0.1:
            pt = "Z" * 128  # non-hex 128 chars: PROCTITLE path appends marker
        lines.append(f"type=PROCTITLE msg={aud}: proctitle={pt}")
    if rng.random() < 0.5:
        exitv = rng.choice(["-13", "0", "EACCES", "-2", "-99999"])
        comm = rng.choice(COMMS)
        lines.append(
            f"type=SYSCALL msg={aud}: arch=x86_64 syscall={rng.choice(['openat', '59', 'connect'])} "
            f"success={rng.choice(['yes', 'no'])} exit={exitv} comm={comm} "
            f"exe={rng.choice(['/usr/sbin/httpd', chr(34) + '/usr/bin/a b' + chr(34)])} subj=a:b:c"
        )
    if rng.random() < 0.4:
        # node= on context records too: shared host is last-raw-line-wins
        nd = f"node=ctx{rng.randint(1, 5)} " if rng.random() < 0.2 else ""
        lines.append(f'{nd}type=CWD msg={aud}: cwd="/home/{rng.choice(["user", "a b"])}"')
    if rng.random() < 0.25:
        # SOCKADDR: hex form populates saddr; interpreted struct form does
        # NOT (reference pattern is hex-only, parse_avc.py:600)
        sa = rng.choice([
            "0200005000000000",
            "02001538C0A80002" * rng.choice([1, 2]),
            "{ saddr_fam=inet laddr=10.0.0.%d lport=%d }" % (rng.randint(1, 9), rng.randint(1, 65535)),
            "01002F72756E2F64627573",
        ])
        lines.append(f"type=SOCKADDR msg={aud}: saddr={sa}")
    if rng.random() < 0.25:
        argc = rng.randint(1, 3)
        args = " ".join(
            f'a{i}="{rng.choice(["/usr/bin/x", "-v", "two words", ""])}"'
            for i in range(argc)
        )
        lines.append(f"type=EXECVE msg={aud}: argc={argc} {args}")
    for item in range(rng.randint(0, 3)):
        nt = rng.choice(["NORMAL", "PARENT", "CREATE"])
        lines.append(
            f'type=PATH msg={aud}: item={item} name="/d{rng.randint(0, 3)}/f{rng.randint(0, 5)}" '
            f"nametype={nt} inode={rng.randint(1, 999)} dev=fd:0{rng.randint(0, 3)}"
        )
    if rng.random() < 0.3:
        lines.append(f"type=JUNKTYPE msg={aud}: some unparsed record kind")
    if rng.random() < 0.1:
        # policy records inside a denial block are inert for denial parsing
        lines.append(
            f"type=MAC_POLICY_LOAD msg={aud}: policy loaded auid=500 ses=2"
            if rng.random() < 0.5
            else f"type=MAC_STATUS msg={aud}: enforcing=1 old_enforcing=0 auid=500"
        )
    if rng.random() < 0.06:
        # USER_AVC without msg='...' content → dropped by both
        lines.append(
            f"type=USER_AVC msg={aud}: pid={rng.randint(10, 99)} uid=81 "
            f"auid=4294967295 ses=7 policyload notice"
        )
    if rng.random() < 0.15:
        lines.append("totally not an audit line at all")

    # occasionally: node= prefix, interpreted timestamps, USER_AVC,
    # SELINUX_ERR — the full record-shape domain
    if rng.random() < 0.1:
        dbus_dest = (
            f"dest=:1.{rng.randint(1, 99)} " if rng.random() < 0.5 else ""
        )
        lines.append(
            f"type=USER_AVC msg={aud}: pid={rng.randint(100, 999)} uid=81 "
            f"auid=4294967295 msg='avc:  denied  {{ {rng.choice(['send_msg', 'acquire_svc'])} }} for "
            f"{dbus_dest}"
            f"scontext={rng.choice(CONTEXTS)} tcontext={rng.choice(CONTEXTS)} tclass=dbus'"
        )
    if rng.random() < 0.12:
        form = rng.random()
        if form < 0.4:
            lines.append(
                f"type=SELINUX_ERR msg={aud}: security_compute_sid: invalid context "
                f"x:y:z:s99 for scontext={rng.choice(CONTEXTS)} "
                f"tcontext={rng.choice(CONTEXTS)} tclass=process"
            )
        elif form < 0.55:
            # tclass missing → fails the ordered grammar → dropped by both
            lines.append(
                f"type=SELINUX_ERR msg={aud}: op=security_bounded_transition "
                f"scontext={rng.choice(CONTEXTS)} tcontext={rng.choice(CONTEXTS)}"
            )
        elif form < 0.85:
            # valid USER_SELINUX_ERR: op-first grammar inside msg='...'
            sckey = rng.choice(["oldcontext", "scontext"])
            tckey = "newcontext" if sckey == "oldcontext" else "tcontext"
            lines.append(
                f"type=USER_SELINUX_ERR msg={aud}: pid={rng.randint(10, 999)} uid=0 "
                f"msg='op=security_compute_av invalid context "
                f"{sckey}={rng.choice(CONTEXTS)} {tckey}={rng.choice(CONTEXTS)} "
                f"seresult=deny'"
            )
        else:
            # bare USER_SELINUX_ERR without msg content → dropped by both
            lines.append(
                f"type=USER_SELINUX_ERR msg={aud}: security_compute_sid: invalid "
                f"context x:y:z for scontext={rng.choice(CONTEXTS)} "
                f"tcontext={rng.choice(CONTEXTS)} tclass=process"
            )
    if rng.random() < 0.08:
        # AVC_PATH: denial-family record run through the full battery
        # (parse_avc.py:886-895). The bare path-info form has no permission
        # → invalid denial, dropped by BOTH implementations; the rare
        # denied-clause form parses like an AVC with denial_type=AVC_PATH.
        if rng.random() < 0.5:
            lines.append(
                f'type=AVC_PATH msg={aud}:  path="/var/www/html/p{rng.randint(0, 9)}"'
            )
        else:
            lines.append(
                f"type=AVC_PATH msg={aud}: avc:  denied  {{ {rng.choice(PERMS)} }} for "
                f"pid={rng.randint(1, 9999)} comm={rng.choice(COMMS)} "
                f"path=\"/srv/p{rng.randint(0, 9)}\" scontext={rng.choice(CONTEXTS)} "
                f"tcontext={rng.choice(CONTEXTS)} tclass={rng.choice(TCLASSES)}"
            )
    node = f"node=h{rng.randint(1, 9)} " if rng.random() < 0.15 else ""

    # the AVC line itself (sometimes FANOTIFY or the numeric 1400 ≡ AVC)
    r = rng.random()
    rtype = "FANOTIFY" if r < 0.06 else ("1400" if r < 0.12 else "AVC")
    parts = [f"{node}type={rtype} msg={aud}: avc:  denied  {{ {rng.choice(PERMS)} }} for "]
    fields = []
    if rng.random() < 0.95:
        fields.append(f"pid={rng.randint(1, 99999)}")
    fields.append(f"comm={rng.choice(COMMS)}")
    p = rng.choice(PATHS)
    if p:
        fields.append(f"path={p}")
    if rng.random() < 0.4:
        fields.append(f"name={rng.choice(['x.html', 'f', chr(34) + 'q n' + chr(34), '?'])}")
    if rng.random() < 0.3:
        fields.append(f"dev=fd:0{rng.randint(0, 3)} ino={rng.randint(1, 9999)}")
    if rng.random() < 0.3:
        fields.append(f"dest={rng.choice(['80', '5432', ':1.42'])}")
    if rng.random() < 0.3:
        # AVC-embedded proctitle (non-strict decode path, parse_avc.py:989-1012):
        # result is stripped; non-hex values pass AS-IS with no 128-char marker
        fields.append("proctitle=" + rng.choice([
            "666F6F00",            # → 'foo\x00' → 'foo ' → stripped 'foo'
            "2F7573722F62696E2F78",  # → '/usr/bin/x'
            "z" * 128,             # non-hex 128 chars: kept as-is, no marker
            "41" * 127 + "00",     # 256 hex, trailing NUL → no marker, stripped
            "41" * 128,            # 256 hex, no trailing NUL → marker appended
        ]))
    fields.append(f"scontext={rng.choice(CONTEXTS)}")
    fields.append(f"tcontext={rng.choice(CONTEXTS)}")
    fields.append(f"tclass={rng.choice(TCLASSES)}")
    if rng.random() < 0.5:
        fields.append(f"permissive={rng.randint(0, 1)}")
    rng.shuffle(fields)
    parts.append(" ".join(fields))
    lines.insert(rng.randint(0, len(lines)), "".join(parts))

    # occasionally a SECOND AVC line in the same block (distinct serial) —
    # both share the block's non-AVC context (reference merges per block)
    if rng.random() < 0.2:
        lines.insert(
            rng.randint(0, len(lines)),
            f"type=AVC msg=audit({ts}:{serial + 1}): avc:  denied  "
            f"{{ {rng.choice(PERMS)} }} for pid={rng.randint(1, 9999)} "
            f"comm={rng.choice(COMMS)} scontext={rng.choice(CONTEXTS)} "
            f"tcontext={rng.choice(CONTEXTS)} tclass={rng.choice(TCLASSES)}",
        )

    rng.shuffle(lines)  # field order robustness (records are unordered)
    block = "\n".join(lines)
    if rng.random() < 0.2:
        # `) :` spacing after the event id (real ausearch exports)
        block = block.replace(f"msg={aud}:", f"msg={aud} :")
    return block


def test_differential_fuzz_1000_blocks():
    # two independent seeds — a 5000-block exploratory run with a third seed
    # also passed clean (round 2); these keep CI time bounded
    rng1, rng2 = random.Random(20260816), random.Random(99887766)
    blocks = [(f"fz{i}", gen_block(rng1)) for i in range(1000)]
    blocks += [(f"fz{1000 + i}", gen_block(rng2)) for i in range(500)]
    pdf = pd.DataFrame(
        {
            "url": [u for u, _ in blocks],
            "warc_ts": [pd.Timestamp("2025-01-01")] * len(blocks),
            "text": [t for _, t in blocks],
            "lang": ["en"] * len(blocks),
        }
    )
    ours_all = parse_pages_pdf(pdf)

    mismatches = []
    for url, block in blocks:
        ref_rows, _ = ref.parse_avc_log(block)
        our_rows = ours_all[
            (ours_all["url"] == url) & (ours_all["route"] == "parse_ok")
        ].sort_values("event_id")
        if len(ref_rows) != len(our_rows):
            mismatches.append(f"{url}: count ref={len(ref_rows)} ours={len(our_rows)}")
            continue
        for i, rd in enumerate(sorted(ref_rows, key=lambda d: str(d.get("event_id")))):
            for ours_f, ref_f in FIELD_MAP.items():
                rv = rd.get(ref_f)
                if hasattr(rv, "type"):
                    rv = str(rv)
                ov = our_rows.iloc[i][ours_f]
                if _norm(ov) != _norm(rv):
                    mismatches.append(
                        f"{url}[{i}].{ours_f}: ref={rv!r} ours={ov!r} | {block[:120]!r}"
                    )
            # timestamps: per-line for normal denials, block-default for
            # SELINUX_ERR-family / unparseable per-line forms
            rts = rd.get("datetime_obj")
            ots = our_rows.iloc[i]["event_ts"]
            if rts is not None and pd.notna(ots):
                if pd.Timestamp(rts) != pd.Timestamp(ots):
                    mismatches.append(
                        f"{url}[{i}].event_ts: ref={rts} ours={ots} | {block[:120]!r}"
                    )
            elif (rts is None) != bool(pd.isna(ots)):
                mismatches.append(
                    f"{url}[{i}].event_ts presence: ref={rts} ours={ots}"
                )
    assert not mismatches, "\n".join(mismatches[:20]) + f"\n({len(mismatches)} total)"
