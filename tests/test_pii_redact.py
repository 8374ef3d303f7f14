"""PiiRedactor (stages/text.PiiRedactor) vs a plain-Python re reference:
sequential email -> IPv4 -> phone redaction with per-class counts taken
at each stage position. Python's re and Arrow's RE2 agree on these
patterns (no backtracking constructs), so the scalar twin is exact."""
import re

import pyarrow as pa

from osmium_tool_ray.stages.text import PiiRedactor


def _scalar(t: str):
    n_e = len(re.findall(PiiRedactor.EMAIL, t))
    t = re.sub(PiiRedactor.EMAIL, "<EMAIL>", t)
    n_i = len(re.findall(PiiRedactor.IPV4, t))
    t = re.sub(PiiRedactor.IPV4, "<IP>", t)
    n_p = len(re.findall(PiiRedactor.PHONE, t))
    t = re.sub(PiiRedactor.PHONE, "<PHONE>", t)
    return t, n_e, n_i, n_p


CASES = [
    "plain text with no pii at all",
    "mail me at a.b-c_d%e@sub.example.co.uk today",
    "two mails x@y.io and z@w.org plus ip 192.168.0.1",
    "phone 555-123-4567 then ip 10.0.0.255 then phone 111-222-3333",
    # adjacent digits must not merge across classes once redacted
    "ip-then-phone 1.2.3.4 555-000-0000",
    # phone-shaped digits inside a longer run are NOT a phone (\b fails)
    "not a phone 1555-123-45678 but 555-123-4567 is",
    # ip needs all four octets
    "not an ip 1.2.3 and not 1.2.3. but 1.2.3.4 yes",
    # an ip-shaped host is NOT an email (TLD must be alphabetic) — the
    # ip pass picks it up instead
    "user@10.0.0.1 is not an email (no alpha TLD)",
    "",
    "edge 0.0.0.0 and 999.999.999.999 both match the liberal ipv4",
]


def test_pii_redactor_matches_scalar_re():
    batch = pa.table({"text": pa.array(CASES, type=pa.string())})
    out = PiiRedactor(text_col="text")(batch)
    for i, t in enumerate(CASES):
        want_t, n_e, n_i, n_p = _scalar(t)
        assert out["clean"][i].as_py() == want_t, t
        assert out["n_emails"][i].as_py() == n_e, t
        assert out["n_ips"][i].as_py() == n_i, t
        assert out["n_phones"][i].as_py() == n_p, t


def test_pii_counts_are_stage_position_counts():
    # a real email whose redaction leaves ip-shaped digits untouched:
    # the ip count is taken AFTER email redaction, on the rewritten text
    batch = pa.table({"text": pa.array(["a@b.co 1.2.3.4 done",
                                        "user@10.0.0.1 only"],
                                       type=pa.string())})
    out = PiiRedactor()(batch)
    assert out["n_emails"].to_pylist() == [1, 0]
    assert out["n_ips"].to_pylist() == [1, 1]
    assert out["clean"].to_pylist() == ["<EMAIL> <IP> done",
                                        "user@<IP> only"]
