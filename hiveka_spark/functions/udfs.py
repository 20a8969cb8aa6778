"""The engine's Python UDF surface (SURVEY.md §2B "UDF surface" row):
vectorized scalar pandas UDF, grouped-map applyInPandas, grouped-agg pandas
UDAF.  The reference exposes no scalar functions of its own (zero function
code in the repo — SURVEY §2B note); this layer exists to prove the
Arrow-batched Python escape hatch works and is correctly planned.

Scale rules enforced here:
- Every UDF is Arrow-batched (pandas series/frames), never row-at-a-time.
- UDFs are the LAST resort: each one below has a pure-SQL twin used as its
  oracle, demonstrating the JVM path exists; real pipelines should prefer it.
- Grouped-map shuffles once on the group key; output schemas are declared
  (no inference, stable across batches).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def py_density(text: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: tokens-per-character density, floor-quantized.
    Whole pandas-Series ops — one Arrow batch per ~10k rows, no Python loop."""
    import numpy as np

    n_tok = text.str.split(" ").map(lambda ws: sum(1 for w in ws if w))
    n_chars = text.str.len()
    return np.floor(n_tok * 10000.0 / (n_chars + 1)) / 10000.0


@pandas_udf("double")
def py_mean(v: pd.Series) -> float:  # grouped-agg pandas UDAF
    """Grouped-aggregate pandas UDAF: mean over the group's Arrow batch.
    Partial aggregation is NOT available to Python UDAFs — the whole group
    ships to one worker — so keep these to bounded-cardinality groups and
    prefer JVM aggregates for anything hot."""
    return float(v.mean())


@pandas_udf("long")
def py_count(v: pd.Series) -> int:  # grouped-agg pandas UDAF
    """Count as a pandas UDAF — Spark disallows mixing pandas and JVM
    aggregates in one aggregation (INVALID_PANDAS_UDF_PLACEMENT), so a
    pandas-UDAF query needs its companions in pandas too."""
    return int(len(v))


def zscore_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "z",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score (sample std, ddof=1 —
    the STDDEV_SAMP convention, so the SQL twin matches).  One shuffle on the
    group key; each group is one pandas frame.

    Pass-through columns default to every df column except the group and
    value columns (override with ``id_cols``) — nothing is hardcoded, so any
    keyed frame works."""
    if id_cols is None:
        id_cols = [c for c in df.columns if c not in (group_col, value_col)]
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + [f"{group_col} {df.schema[group_col].dataType.simpleString()}",
           f"{out_col} double"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf[value_col].astype("float64")
        std = v.std(ddof=1)
        z = (v - v.mean()) / std if std and std > 0 else pd.Series([None] * len(v))
        out = {c: pdf[c] for c in id_cols}
        out[group_col] = pdf[group_col]
        out[out_col] = np.floor(z * 10000.0) / 10000.0
        return pd.DataFrame(out)

    return df.groupBy(group_col).applyInPandas(fn, schema)


def ngram_udtf():
    """A true Python UDTF (Spark 4 ``udtf``): SELECT * FROM ngrams(TABLE(...))
    — lateral table function producing word bigrams per document.

    UDTFs are the SQL-callable fan-out surface (vs ``mapInPandas`` which is
    DataFrame-API-only); registered once, usable from any spark.sql query.
    eval() is row-at-a-time, so keep UDTFs to cold paths and prefer
    explode(...)/mapInPandas for hot ones.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, bigram string")
    class NGrams:
        def eval(self, doc_id: int, text: str):
            ws = [w for w in text.split(" ") if w]
            for a, b in zip(ws, ws[1:]):
                yield doc_id, f"{a} {b}"

    return NGrams


def tokenize_map_in_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """mapInPandas as the UDTF-ish surface: one input row fans out to N output
    rows (one per whitespace token), schema declared up front.

    No shuffle is introduced — the fan-out happens inside each input
    partition's Arrow batch stream, so at 100 TB this scales exactly like the
    scan (the JVM twin is ``explode(split(...))``, which real pipelines should
    prefer; this exists to prove the Python escape hatch plans correctly)."""
    schema = "doc_id bigint, token string, token_len bigint"

    def fn(batches):
        for pdf in batches:
            toks = pdf[text_col].str.split(" ").map(
                lambda ws: [w for w in ws if w]
            )
            out = pd.DataFrame(
                {"doc_id": pdf["doc_id"].repeat(toks.map(len)).values,
                 "token": [w for ws in toks for w in ws]}
            )
            out["token_len"] = out["token"].str.len().astype("int64")
            yield out

    return df.select("doc_id", text_col).mapInPandas(fn, schema)
