"""HTML -> text extraction (vectorized pandas UDF).

The reference scans FASTA records (src/SketchInfo.cpp:29 kseq); the webtext
analog is extracting text from the html binary column.  The north rule
requires the extracted text to be byte-identical per url to the reference
extractor — here the reference extractor is defined by the fixture template
(fixtures/webtext.py render_html): paragraphs in <p>…</p>, joined by
"\\n\\n".  extract_text_bytes() is its exact inverse and is verified
byte-for-byte in tests.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)


def extract_text_bytes(html: bytes | None) -> str:
    if not html:
        return ""
    paras = _P_RE.findall(html)
    return b"\n\n".join(paras).decode("utf-8", errors="replace")


def with_extracted_text(df: DataFrame, html_col: str = "html",
                        out_col: str = "text") -> DataFrame:
    """Add/replace ``out_col`` extracted from the html binary column."""
    in_cols = [c for c in df.columns if c != out_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*in_cols).schema.fields
    ) + f", {out_col} string"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [extract_text_bytes(h) for h in pdf[html_col]]
            yield pdf

    return df.select(*in_cols).mapInPandas(extract, schema=schema)
