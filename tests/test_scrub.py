"""PII scrubbing operator (training-pipeline extension)."""
from pyspark.sql import functions as F

from xltsearch_spark.operators import scrub


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    out = scrub.redact_pii(df).orderBy("doc_id")
    return out.collect()


def test_email_ip_phone_redaction(spark):
    [r] = _run(spark, ["mail alice.smith+x@sub.example.org or 192.168.1.254 "
                       "or +1 555-123-4567 end"])
    assert r["redacted"] == "mail <EMAIL> or <IP> or <PHONE> end"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1)


def test_counts_measured_on_original_text(spark):
    [r] = _run(spark, ["a@b.io c@d.io 10.0.0.1"])
    assert r["n_email"] == 2 and r["n_ipv4"] == 1 and r["n_phone"] == 0


def test_clean_text_untouched(spark):
    [r] = _run(spark, ["no pii here, just words and 12 numbers"])
    assert r["redacted"] == "no pii here, just words and 12 numbers"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)


def test_email_before_ip_order(spark):
    # a dotted-quad INSIDE an email local/domain is consumed by <EMAIL>
    # (order contract: email pass runs first)
    [r] = _run(spark, ["x@1.2.3.4.example.com stays one token"])
    assert r["redacted"] == "<EMAIL> stays one token"
    assert r["n_email"] == 1


def test_plan_is_udf_and_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    plan = scrub.redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_ipv4_octet_range_validation(spark):
    """Strict dotted-quad contract: octets 0-255, no leading zeros —
    out-of-range 'quads' are NOT PII and must survive."""
    rows = _run(spark, [
        "valid 255.255.255.255 edge",
        "valid 0.0.0.0 zeros",
        "invalid 999.999.999.999 garbage",
        "invalid 256.1.1.1 octet",
        "padded 010.1.2.3 octet",
    ])
    assert rows[0]["redacted"] == "valid <IP> edge"
    assert rows[1]["redacted"] == "valid <IP> zeros"
    assert rows[2]["redacted"] == "invalid 999.999.999.999 garbage"
    assert rows[3]["redacted"] == "invalid 256.1.1.1 octet"
    assert rows[4]["redacted"] == "padded 010.1.2.3 octet"
    assert [r["n_ipv4"] for r in rows] == [1, 1, 0, 0, 0]


def test_pii_boundary_golden_cases(spark):
    """Golden boundary fixtures: plus-tagged emails, version-like dotted
    numbers, phones embedded in longer digit runs."""
    rows = _run(spark, [
        "tagged bob+filter@mail.example.co end",        # plus tag kept whole
        "release v1.2.3.4 is not an address",            # version quad IS a
                                                         # valid in-range quad
        "id 0012345678901234 carries no + so no phone",  # bare digit run
        "call +49 30 901820 now",                        # spaced intl phone
    ])
    assert rows[0]["redacted"] == "tagged <EMAIL> end"
    # 'v1.2.3.4' survives: there is no \b between the word chars 'v' and
    # '1', so the quad never starts — version strings are not redacted
    assert rows[1]["redacted"] == "release v1.2.3.4 is not an address"
    assert rows[1]["n_ipv4"] == 0
    assert rows[2]["n_phone"] == 0
    assert rows[2]["redacted"].endswith("no + so no phone")
    assert rows[3]["redacted"] == "call <PHONE> now"
