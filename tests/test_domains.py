"""URL/domain curation operators (training-pipeline extensions)."""
import pytest
from pyspark.sql import functions as F

from xltsearch_spark.operators import domains


@pytest.fixture(scope="module")
def urls(spark):
    rows = []
    for i in range(40):
        host = f"site{i % 4}.example.com"
        scheme = "https" if i % 2 == 0 else "HTTP"
        port = ":8080" if i % 5 == 0 else ""
        h = host.upper() if i % 3 == 0 else host
        rows.append((i, f"{scheme}://{h}{port}/page/{i}?x=1"))
    rows.append((100, "user:pw@oops"))          # not an absolute URL
    rows.append((101, "ftp://u@files.example.org/f"))
    return spark.createDataFrame(rows, "doc_id long, url string").persist()


def test_host_extraction_normalizes(spark, urls):
    got = {r["doc_id"]: r["domain"]
           for r in urls.select("doc_id",
                                domains.url_host(F.col("url"))
                                .alias("domain")).collect()}
    assert got[0] == "site0.example.com"        # upper host + port stripped
    assert got[1] == "site1.example.com"        # HTTP scheme accepted
    assert got[100] == ""                       # relative/opaque -> empty
    assert got[101] == "files.example.org"      # userinfo stripped


def test_registered_domain_last_two_labels(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)], "h string")
    got = [r[0] for r in df.select(
        domains.registered_domain(F.col("h"))).collect()]
    assert got == ["example.com", "example.com", "localhost"]


def test_blocklist_and_cap_precedence(spark, urls):
    out = domains.domain_curate(
        urls, blocklist=("site1.example.com",), max_per_domain=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 42                      # label mode keeps every row
    # every site1 doc blocked, regardless of doc_id rank
    for i in range(1, 40, 4):
        assert rows[i]["reason"] == "blocked_domain" and rows[i]["keep"] == 0
    # site0: ids 0,4,8,... -> lowest three kept, rest over cap
    site0 = sorted(i for i in range(0, 40, 4))
    for i in site0[:3]:
        assert rows[i]["reason"] == "kept" and rows[i]["keep"] == 1
    for i in site0[3:]:
        assert rows[i]["reason"] == "over_domain_cap" and rows[i]["keep"] == 0


def test_filter_mode_matches_label_keeps_and_uses_group_limit(spark, urls):
    lab = domains.domain_curate(urls, max_per_domain=2)
    fil = domains.domain_curate(urls, max_per_domain=2, mode="filter")
    assert ({r["doc_id"] for r in fil.collect()} ==
            {r["doc_id"] for r in lab.filter("keep = 1").collect()})
    plan = fil._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_no_cap_plans_no_window(spark, urls):
    out = domains.domain_curate(urls, blocklist=("site2.example.com",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert out.filter("reason = 'over_domain_cap'").count() == 0


def test_validation(spark, urls):
    with pytest.raises(ValueError):
        domains.domain_curate(urls, max_per_domain=0)
    with pytest.raises(ValueError):
        domains.domain_curate(urls, mode="report")


def test_domain_report_counts(spark, urls):
    v = domains.domain_curate(urls, blocklist=("site3.example.com",),
                              max_per_domain=5)
    rep = {r["domain"]: (r["n_docs"], r["n_kept"])
           for r in domains.domain_report(v).collect()}
    assert rep["site0.example.com"] == (10, 5)
    assert rep["site3.example.com"] == (10, 0)
