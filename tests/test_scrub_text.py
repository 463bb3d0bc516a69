"""$scrubText — PII placeholder substitution for training corpora."""

import pytest
from pyspark.sql import Row

from pincette_mongo_streams_spark import Context, compile_pipeline


def _run(spark, text, **opts):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = compile_pipeline(
        [{"$scrubText": {"input": "$text", "as": "clean", **opts}}],
        Context(spark=spark))(df)
    return out.collect()[0].clean


def test_scrubs_all_default_rules(spark):
    got = _run(spark, "mail a@b.co or visit https://x.io/p?q=1 from "
                      "10.0.0.1 or call +1 (555) 123-4567 ok")
    assert got == "mail <EMAIL> or visit <URL> from <IP> or call <PHONE> ok"


def test_email_wins_over_url_and_phone(spark):
    # the address contains a domain and digits; it must scrub as ONE email
    got = _run(spark, "contact john.doe99@mail.example.com today")
    assert got == "contact <EMAIL> today"


def test_rules_subset(spark):
    got = _run(spark, "a@b.co https://x.io", rules=["url"])
    assert got == "a@b.co <URL>"


def test_unknown_rule_rejected(spark):
    with pytest.raises(ValueError, match="unknown rule"):
        _run(spark, "x", rules=["ssn"])


def test_plain_text_untouched(spark):
    text = "ordinary prose with numbers like 42 and v1.2 stays put"
    assert _run(spark, text) == text
