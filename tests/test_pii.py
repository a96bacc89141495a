"""PII detection/redaction."""

from pyspark.sql import functions as F

from final_ocr_spark.operators.pii import pii_profile


def test_pii_counts_and_redaction(spark):
    text = ("Contact jane.doe+spam@mail.example.co.uk or admin@host.org, "
            "server at 10.0.255.3, call +1 (555) 123-4567 today.")
    df = spark.createDataFrame([(text,)], ["text"])
    r = pii_profile(df).collect()[0]
    assert r["n_email"] == 2
    assert r["n_ipv4"] == 1
    assert r["n_phone"] == 1
    assert r["text_redacted"] == ("Contact <EMAIL> or <EMAIL>, "
                                  "server at <IP>, call <PHONE> today.")


def test_pii_clean_text_untouched(spark):
    text = "no pii here, just words and the number 42."
    df = spark.createDataFrame([(text,)], ["text"])
    r = pii_profile(df).collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)
    assert r["text_redacted"] == text


def test_pii_email_not_eaten_by_phone(spark):
    # digits inside an already-masked email must not retrigger phone rule
    df = spark.createDataFrame([("mail 12345678901@nums.example.com now",)], ["text"])
    r = pii_profile(df).collect()[0]
    assert r["n_email"] == 1
    assert r["text_redacted"] == "mail <EMAIL> now"
