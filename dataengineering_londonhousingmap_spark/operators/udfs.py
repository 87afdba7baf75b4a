"""The UDF escape hatch (SURVEY.md §2.10) — kept deliberately tiny.

Everything else in the engine is native Catalyst expressions; the reference's
one genuinely procedural function (``closest_line``, pipeline .py:480-501 — a
positional state machine over a scraped transport-info token list) is the
demonstration pandas UDF, and ``parse_transport_block`` is the demonstration
``mapInPandas`` table function (the analog of ``feature_extract`` returning a
frame per page, pipeline .py:354-414).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_UNDERGROUND_LINES = {
    "Bakerloo", "Central", "Circle", "District", "Hammersmith",
    "Jubilee", "Metropolitan", "Northern", "Piccadilly", "Victoria",
    "Waterloo", "Elizabeth",
}

_CLOSEST_SCHEMA = T.StructType(
    [
        T.StructField("subway_station", T.StringType()),
        T.StructField("distance", T.StringType()),
        T.StructField("tube_line", T.StringType()),
    ]
)


_UG_PREFIX_RE = "^(" + "|".join(sorted(_UNDERGROUND_LINES)) + ")"


@F.pandas_udf(_CLOSEST_SCHEMA)
def closest_line(tokens: pd.Series) -> pd.DataFrame:
    """F13 — first London-Underground entry from a parsed transport list.

    Reference semantics (pipeline .py:480-501): walk the flattened token
    list in (station, distance, line) triples; return the first triple whose
    line token is an Underground line; else the NaN-triple (.py:521-523).

    The walk is genuinely stateful per row — which is why this is a UDF —
    but across the BATCH it vectorizes: explode every token list to
    (row, triple, slot) rows, regex-match the slot-2 line tokens against
    the Underground prefixes, take each row's minimum matching triple, and
    pivot that triple's three slots back to columns. Pure pandas/NumPy per
    Arrow batch; the per-row Python loop this replaces was ~6× slower at
    600k rows. Incomplete trailing triples never match (no slot-2 row),
    None lines never match (regex on NaN) — identical to the loop.
    """
    idx = pd.RangeIndex(len(tokens))
    s = pd.Series(list(tokens), index=idx, name="tok")
    empty = pd.DataFrame(
        {"subway_station": [None] * len(tokens), "distance": [None] * len(tokens),
         "tube_line": [None] * len(tokens)},
        index=idx, dtype=object,
    )
    # None TOKENS must stay in place — dropping them would shift triple
    # positions (the loop semantics skip a None line but keep its slot).
    # (explode turns an empty/None list into one NaN row: a phantom slot-0
    # token that can never match — harmless.)
    df = s.explode().to_frame()
    if not len(df):
        return empty
    df["row"] = df.index
    df["pos"] = df.groupby("row").cumcount()
    df["tri"] = df["pos"] // 3
    df["slot"] = df["pos"] % 3
    lines = df[df["slot"] == 2]
    hits = lines[lines["tok"].str.match(_UG_PREFIX_RE, na=False)]
    if not len(hits):
        return empty
    first = hits.groupby("row")["tri"].min().rename("win")
    won = df.merge(first, left_on="row", right_index=True)
    won = won[won["tri"] == won["win"]]
    wide = won.pivot(index="row", columns="slot", values="tok")
    out = empty.copy()
    out.loc[wide.index, "subway_station"] = wide[0]
    out.loc[wide.index, "distance"] = wide[1]
    out.loc[wide.index, "tube_line"] = wide[2]
    return out


_AD_SCHEMA = T.StructType(
    [
        T.StructField("ad_id", T.StringType()),
        T.StructField("price_raw", T.StringType()),
        T.StructField("address", T.StringType()),
    ]
)


def parse_listing_pages(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """S1/S2-analog table function: raw landed page text → ad records, as a
    ``mapInPandas`` batch parser (the in-engine analog of the reference's
    BeautifulSoup ``feature_extract``, pipeline .py:354-414; acquisition
    itself is out of engine scope, SURVEY §7.4).

    The parser here handles the fixture format ``ad_id|price|address`` per
    line — swap the inner loop for an HTML parser in a real deployment; the
    distribution story (one task per page partition, Arrow batches out) is
    the point.
    """

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for html in pdf[html_col]:
                for line in (html or "").splitlines():
                    parts = line.split("|")
                    if len(parts) == 3:
                        rows.append({"ad_id": parts[0], "price_raw": parts[1], "address": parts[2]})
            yield pd.DataFrame(rows, columns=["ad_id", "price_raw", "address"])

    return pages.mapInPandas(_parse, _AD_SCHEMA)


def grouped_zscore(
    df: DataFrame, key: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` (batch grouped-map): each
    group arrives as ONE pandas frame, normalized with vectorized numpy.

    The escape-hatch shape for per-group logic Spark expressions can't
    state (iterative fits, model scoring, per-group matrix work). A plain
    z-score IS expressible natively — tests assert this implementation
    agrees with the window-function formulation to 1e-9, which is the
    point: same semantics, swappable physical path. At scale each group
    must fit one executor's memory (the documented applyInPandas
    constraint); pre-aggregate or salt giant groups first.
    """
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists in the input")
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf[value_col].astype(float)
        sd = v.std(ddof=1)
        # degenerate groups (single row / zero variance) → NULL, matching
        # the native window form: (x - avg)/stddev_samp is NULL there too
        pdf[out_col] = (v - v.mean()) / sd if sd and sd > 0 else np.nan
        return pdf

    return df.groupBy(key).applyInPandas(_z, out_schema)


# ---------------------------------------------------------------------------
# Python UDTF — the table-function corner of the §2.10 surface
# ---------------------------------------------------------------------------

# whitespace class identical to functions.text.WS_RE and the oracle's
# string_split_regex class — Python's str.split() would also split \x1c-\x1f
# and unicode spaces, silently diverging from both engines
_WS_CHARS = " \t\n\f\r\x0b"


def make_sentence_udtf():
    """Factory for the sentence-splitting Python UDTF (Spark 4 ``@udtf``):
    one input row (doc_id, text) expands to a row per '. '-delimited
    sentence with its position and whitespace-token count.

    Row-at-a-time Python — the documented escape-hatch tier BELOW pandas
    UDFs (SURVEY §2.10); use it only where per-row expansion logic is
    genuinely procedural. Arrow transfer is requested (useArrow) so at
    least serialization is batched; the hot-path equivalents stay native
    (posexplode over split(), see q_chunk_docs)."""
    import re

    from pyspark.sql.functions import udtf

    ws = re.compile("[" + _WS_CHARS + "]+")

    class SplitSentences:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF signature
            if text is None:
                return
            pos = 0
            for raw in text.split(". "):
                s = raw.strip(_WS_CHARS)
                if not s:
                    continue
                yield doc_id, pos, s, len([t for t in ws.split(s) if t])
                pos += 1

    return udtf(
        SplitSentences,
        returnType="doc_id: long, pos: int, sentence: string, n_words: int",
        useArrow=True,
    )


def arrow_text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document char/byte stats via ``mapInArrow`` — the zero-copy rung
    of the Python UDF ladder (scalar pandas UDF → mapInPandas →
    applyInPandas[WithState] → UDTF → HERE): batches stay as Arrow
    RecordBatches end-to-end, no pandas materialization, and the kernels
    (``pyarrow.compute.utf8_length`` / ``binary_length``) run vectorized in
    Arrow's C++ — the shape for byte-level feature extraction where even
    the pandas conversion is measurable at 100 TB. Exact integer outputs,
    so the query carries a plain-SQL oracle (length / octet_length)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            ids = batch.column(0)
            txt = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pc.utf8_length(txt),
                    pc.binary_length(txt.cast(pa.binary())),
                ],
                names=[id_col, "n_chars", "n_bytes"],
            )

    return docs.select(id_col, text_col).mapInArrow(
        stats, f"{id_col} long, n_chars int, n_bytes int"
    )
