"""HTML -> text extraction: byte-identical per url (north-rule invariant)."""

from rabbittclust_spark.fixtures.webtext import T1, generate_pandas, render_html
from rabbittclust_spark.operators.extract import extract_text_bytes, with_extracted_text


def test_extractor_inverts_template():
    corpus = generate_pandas(T1, 0, 50)
    for _, row in corpus.iterrows():
        assert extract_text_bytes(row["html"]) == row["text"], row["url"]


def test_extractor_edge_cases():
    assert extract_text_bytes(None) == ""
    assert extract_text_bytes(b"") == ""
    assert extract_text_bytes(b"<html><body></body></html>") == ""
    assert extract_text_bytes(render_html("u", "one\n\ntwo")) == "one\n\ntwo"


def test_spark_extraction_byte_identical(spark):
    corpus = generate_pandas(T1, 0, 40)
    df = spark.createDataFrame(corpus[["url", "html", "text"]])
    out = with_extracted_text(df.select("url", "html"), out_col="text")
    got = {r.url: r.text for r in out.collect()}
    for _, row in corpus.iterrows():
        assert got[row["url"]] == row["text"]
