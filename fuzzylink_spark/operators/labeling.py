"""Pair labeling (reference ``check_match()``, R/check_match.R:21-204).

The reference asks an LLM Yes/No per candidate pair, with an exact-match
short-circuit that never calls the API (R/check_match.R:59-63) and a
normalization of free-text replies to title-cased first words
(R/check_match.R:119,141,159,180,200).

Spark surface: a labeler is any ``label_pairs(pairs_df) -> DataFrame[A, B,
match]`` stage. Provided implementations:
- ``ExactLabeler`` — only the short-circuit (A==B -> 'Yes');
- ``GoldLabeler`` — joins a gold-pair table (fixtures/tests): gold pairs
  label 'Yes', everything asked-but-not-gold labels 'No';
- ``CallbackLabeler`` — wraps a driver-side batch function (the slot where
  a real LLM client would plug in; bounded batches, exact short-circuit
  applied first so the callback never sees trivial pairs).

Label upsert (J4) coalesces new labels into the existing tri-state column
(R/fuzzylink.R:447-453).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzylink_spark.functions.text import initcap_first_word


def exact_match_col(case_insensitive: bool = True) -> F.Column:
    """P7 short-circuit predicate.

    NOTE — deliberate deviation: the reference compares case-SENSITIVELY
    (R/check_match.R:59-63 ``string1 == string2``; R/fuzzylink.R:390
    ``df$A == df$B``). We default to lowercased equality because linkage
    keys differing only by case are matches in every fixture we target;
    pass ``case_insensitive=False`` (or set
    ``LinkConfig.exact_case_insensitive=False``) for strict reference
    parity."""
    if case_insensitive:
        return F.lower(F.col("A")) == F.lower(F.col("B"))
    return F.col("A") == F.col("B")


class ExactLabeler:
    def __init__(self, case_insensitive: bool = True):
        self.case_insensitive = case_insensitive

    def label_pairs(self, pairs: DataFrame) -> DataFrame:
        return pairs.select(
            "A", "B",
            F.when(exact_match_col(self.case_insensitive), F.lit("Yes"))
            .otherwise(F.lit(None).cast("string")).alias("match"),
        )


class GoldLabeler:
    """Deterministic oracle from a gold-pair table (test fixtures replace
    the reference's LLM oracle per SURVEY.md §5)."""

    def __init__(self, gold: DataFrame, a_col: str = "a_name", b_col: str = "b_name",
                 case_insensitive: bool = True):
        self.case_insensitive = case_insensitive
        self.gold = gold.select(
            F.lower(F.col(a_col)).alias("_ga"), F.lower(F.col(b_col)).alias("_gb")
        ).distinct()

    def label_pairs(self, pairs: DataFrame) -> DataFrame:
        asked = pairs.select("A", "B").distinct()
        joined = asked.join(
            F.broadcast(self.gold),
            (F.lower(asked.A) == F.col("_ga")) & (F.lower(asked.B) == F.col("_gb")),
            "left",
        )
        return joined.select(
            "A", "B",
            F.when(exact_match_col(self.case_insensitive)
                   | F.col("_ga").isNotNull(), F.lit("Yes"))
            .otherwise(F.lit("No"))
            .alias("match"),
        )


class CallbackLabeler:
    """Driver-batched labeler: collects the (bounded) batch of pairs,
    calls ``fn(list[(a,b)]) -> list[str]``, normalizes replies exactly as
    the reference does (first word, title case -> R/check_match.R:119).

    Prompt context: a real LLM labeler plug-in needs the reference's
    ``record_type``/``instructions`` prompt surface (R/check_match.R:50-54,
    R/fuzzylink.R:34-37). The pipeline calls ``set_context`` with the
    LinkConfig values before labeling; if ``fn`` accepts ``record_type`` /
    ``instructions`` keyword arguments (or ``**kwargs``) they are passed
    through, so the callback can build the reference prompt without
    closing over config."""

    def __init__(self, fn: Callable[[list[tuple[str, str]]], list[str]],
                 spark=None, case_insensitive: bool = True,
                 record_type: str | None = None,
                 instructions: str | None = None):
        self.fn = fn
        self.spark = spark
        self.case_insensitive = case_insensitive
        self.record_type = record_type
        self.instructions = instructions

    def set_context(self, record_type: str | None = None,
                    instructions: str | None = None) -> None:
        """Adopt the pipeline's prompt context (called by ``fuzzylink``
        from LinkConfig). EXPLICIT constructor arguments always win — the
        pipeline only fills slots the user left unset (None), so a
        labeler built with record_type='company' keeps it even when the
        config carries the 'entity' default."""
        if self.record_type is None and record_type is not None:
            self.record_type = record_type
        if self.instructions is None and instructions is not None:
            self.instructions = instructions

    def _call(self, batch: list[tuple[str, str]]) -> list[str]:
        import inspect

        try:
            params = inspect.signature(self.fn).parameters
        except (TypeError, ValueError):  # builtins / C callables
            return self.fn(batch)
        has_var_kw = any(p.kind == inspect.Parameter.VAR_KEYWORD
                         for p in params.values())
        kwargs = {}
        for name, value in (("record_type", self.record_type or "entity"),
                            ("instructions", self.instructions)):
            if has_var_kw or name in params:
                kwargs[name] = value
        return self.fn(batch, **kwargs) if kwargs else self.fn(batch)

    def label_pairs(self, pairs: DataFrame) -> DataFrame:
        spark = self.spark or pairs.sparkSession
        asked = pairs.select("A", "B").distinct()
        em = exact_match_col(self.case_insensitive)
        exact = asked.where(em).withColumn("raw", F.lit("Yes"))
        rest = asked.where(~em)
        rows = rest.collect()  # labeler batches are budget-bounded (max_labels)
        replies = self._call([(r["A"], r["B"]) for r in rows]) if rows else []
        if len(replies) != len(rows):
            raise ValueError(
                f"labeler callback returned {len(replies)} replies for "
                f"{len(rows)} pairs; every asked pair needs exactly one reply"
            )
        rest_labeled = spark.createDataFrame(
            [(r["A"], r["B"], str(rep)) for r, rep in zip(rows, replies)],
            schema="A string, B string, raw string",
        ) if rows else spark.createDataFrame([], schema="A string, B string, raw string")
        return (
            exact.unionByName(rest_labeled)
            .withColumn("match", initcap_first_word(F.col("raw")))
            .withColumn(
                "match",
                F.when(F.col("match").isin("Yes", "No"), F.col("match")),
            )
            .select("A", "B", "match")
        )


def merge_labels(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """J3: left-join labels onto the pair table (R/fuzzylink.R:378-382)."""
    lab = labels.select("A", "B", "match")
    if "match" in pairs.columns:
        return upsert_labels(pairs, labels)
    return pairs.join(lab, ["A", "B"], "left")


def upsert_labels(pairs: DataFrame, new_labels: DataFrame) -> DataFrame:
    """J4: coalesce-upsert new labels into the existing tri-state column
    (R/fuzzylink.R:447-453)."""
    nl = new_labels.select("A", "B", F.col("match").alias("_match_new"))
    return (
        pairs.join(nl, ["A", "B"], "left")
        .withColumn("match", F.coalesce(F.col("match"), F.col("_match_new")))
        .drop("_match_new")
    )
