"""Datagen determinism and distribution."""

from avc_parser_spark.datagen.payload import lang_for, make_payload, route_for


def test_payload_deterministic():
    for i in [0, 1, 17, 999, 123456]:
        assert make_payload(i) == make_payload(i)
        assert lang_for(i) == lang_for(i)


def test_route_distribution():
    n = 20_000
    counts = {"parse_ok": 0, "malformed": 0, "quarantine": 0}
    for i in range(n):
        counts[route_for(i)] += 1
    assert 0.90 < counts["parse_ok"] / n < 0.97
    assert 0.03 < counts["malformed"] / n < 0.08
    assert 0.003 < counts["quarantine"] / n < 0.03


def test_lang_skew():
    n = 20_000
    en = sum(1 for i in range(n) if lang_for(i) == "en")
    assert 0.5 < en / n < 0.6  # hot lang for skew handling


def test_payload_contains_block_separators():
    text, route = make_payload(7)
    assert "----" in text
    if route == "parse_ok":
        assert "type=AVC" in text and "denied" in text
