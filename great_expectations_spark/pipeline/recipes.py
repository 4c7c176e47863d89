"""Composable corpus-cleaning recipes with single-scan rejection lineage.

A production cleaning pipeline (C4, CCNet, RefinedWeb, FineWeb) is an
ORDERED sequence of stages — URL/length/language predicates, quality
suites, then progressively more expensive dedup passes — where each doc
must be attributable to the FIRST stage that rejected it (the per-stage
"removal rate" table every dataset paper publishes). Running stages as
N separate filter jobs costs N corpus scans and loses attribution.

Spark-first composition instead:

* **predicate stages** (keep/drop as a Column) fold into ONE running
  ``rejected_by`` label column — zero extra scans no matter how many,
  and the whole chain stays inside whole-stage codegen.
* **loser stages** (dedup-style: a function from the current SURVIVORS
  to a DataFrame of rejected ids) contribute one id-keyed left join
  each. Only ids cross the shuffle, and the fn sees exactly the docs
  that earlier stages kept — the order the published recipes require
  (dedup after filtering). The prefix is materialized (evictable
  ``fused_checkpoint`` persist — branch reuse, NOT a lineage cut) before
  each loser stage so the prefix never re-executes per stage.
* **suite stages** reuse the expectation engine's fused per-row
  predicates: ``suite_stage`` collapses a whole suite into ONE stage
  (reject reason = the stage name); ``suite_stages`` expands it into one
  predicate stage per expectation, so ``stats()`` becomes the
  per-expectation removal-rate table (reasons =
  ``filtering.reason_label``). Both cost zero extra jobs.

The result keeps all three views: ``annotated`` (every input doc +
nullable ``rejected_by``), ``clean`` (survivors), and ``stats()`` (one
groupBy — docs per rejection stage, in stage order).

The reference repo has no pipeline composition surface (its checkpoint
actions chain VALIDATIONS, not transforms); this extends the
training-data addendum by composing the pipeline/* operators it already
verifies individually. Every stage kind is engine-replayable, so the
end-to-end recipe has a DuckDB oracle (oracle: pipeline_recipe_clean).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline._lineage import (
    fused_checkpoint,
    tracked_checkpoint,
    unpersist_ids,
)

__all__ = [
    "RecipeStage",
    "predicate_stage",
    "losers_stage",
    "suite_stage",
    "suite_stages",
    "blocklist_stage",
    "exact_dedup_stage",
    "run_recipe",
    "RecipeResult",
]

_REJECT_COL = "rejected_by"


@dataclass(frozen=True)
class RecipeStage:
    """One named cleaning stage.

    ``kind="predicate"``: ``fn(df) -> Column`` — TRUE means KEEP. The
    Column may reference any input column; it is evaluated inside the
    fused label expression (no job of its own).

    ``kind="losers"``: ``fn(survivors) -> DataFrame`` whose FIRST column
    holds the ids to reject (duplicates/NULLs in the loser list are
    harmless). Runs against the docs all earlier stages kept. A loser fn
    that REQUIRES a second positional parameter — or a required
    (no-default) parameter named ``id_col`` — also receives the recipe's
    ``id_col`` (so prebuilt stages like ``blocklist_stage`` don't make
    the caller repeat it); a DEFAULTED or ``functools.partial``-bound
    ``id_col`` is the caller's explicit choice and is never overridden.
    """

    name: str
    kind: str
    fn: Callable


def predicate_stage(name: str, fn: Callable[[DataFrame], Column]) -> RecipeStage:
    """Keep-predicate stage: ``fn(df)`` returns a Column, TRUE = keep.
    NULL predicate results reject (SQL ternary logic would silently keep
    them under ``~pred``; cleaning semantics must not)."""
    return RecipeStage(name=name, kind="predicate", fn=fn)


def losers_stage(name: str, fn: Callable[[DataFrame], DataFrame]) -> RecipeStage:
    """Rejected-ids stage: ``fn(survivors)`` returns a DataFrame whose
    first column is the ids to drop (e.g. dedup losers)."""
    return RecipeStage(name=name, kind="losers", fn=fn)


def suite_stage(name: str, suite, options=None, strict: bool = True) -> RecipeStage:
    """Every map expectation in ``suite`` as one fused keep-predicate:
    a doc survives iff it satisfies ALL of them (``mostly`` is a
    corpus-level verdict knob, deliberately ignored here — a filter
    keeps or drops each row on its own merits, reference
    result_format.unexpected semantics). ``strict=True`` raises on
    aggregate/table expectations (no per-row meaning); ``strict=False``
    skips them — same contract as ``filtering.annotate_suite``."""

    def fn(df: DataFrame) -> Column:
        from great_expectations_spark.pipeline.filtering import _row_predicates
        from great_expectations_spark.plans.compiler import Options

        preds = _row_predicates(suite, options or Options(), strict)
        bad = F.lit(False)
        for _, unexpected in preds:
            bad = bad | unexpected
        return ~bad

    return RecipeStage(name=name, kind="predicate", fn=fn)


def suite_stages(suite, options=None, strict: bool = True) -> list[RecipeStage]:
    """One predicate stage PER map expectation, named by its
    ``reason_label`` — ``run_recipe(...).stats()`` then yields the
    per-expectation removal-rate table dataset papers publish (docs
    attributed to the FIRST failing expectation in suite order). Still
    zero extra jobs: consecutive predicate stages fold into the one
    label expression."""
    from great_expectations_spark.pipeline.filtering import _row_predicates
    from great_expectations_spark.plans.compiler import Options

    preds = _row_predicates(suite, options or Options(), strict)

    def mk(unexpected: Column) -> Callable[[DataFrame], Column]:
        return lambda df: ~unexpected

    return [RecipeStage(name=reason, kind="predicate", fn=mk(unexpected))
            for reason, unexpected in preds]


def exact_dedup_stage(
    name: str, id_col: str, text_col: str, *, normalize: bool = False
) -> RecipeStage:
    """Keep-first exact dedup as a loser stage: among survivors sharing a
    text digest, every doc except the min-id keeper is rejected. Only
    16-byte digests + ids shuffle (map-side combinable min)."""

    def fn(survivors: DataFrame) -> DataFrame:
        from great_expectations_spark.pipeline.dedup import _md5

        t = F.col(text_col)
        if normalize:
            t = F.lower(F.regexp_replace(t, r"\s+", " "))
        d = survivors.where(t.isNotNull() & F.col(id_col).isNotNull()).select(
            _md5(t).alias("__dg"), F.col(id_col).alias("__id"))
        keepers = d.groupBy("__dg").agg(F.min("__id").alias("__keep"))
        return (
            d.join(keepers, "__dg")
            .where(F.col("__id") != F.col("__keep"))
            .select(F.col("__id"))
        )

    return RecipeStage(name=name, kind="losers", fn=fn)


def blocklist_stage(
    name: str,
    blocklist: DataFrame,
    url_col: str = "url",
    *,
    id_col: str | None = None,
) -> RecipeStage:
    """UT1-style domain blocklist as a loser stage: a row is rejected when
    its URL's host or ANY parent domain appears in ``blocklist`` (first
    column = lowercase domains). ``id_col`` defaults to the recipe's id
    column at run time."""

    def fn(survivors: DataFrame, recipe_id_col: str) -> DataFrame:
        from great_expectations_spark.pipeline.webtext import blocklist_losers

        return blocklist_losers(
            survivors, blocklist, id_col or recipe_id_col, url_col)

    return RecipeStage(name=name, kind="losers", fn=fn)


@dataclass
class RecipeResult:
    """``annotated`` = every input doc + nullable ``rejected_by``;
    ``clean`` = survivors (original columns); ``stage_names`` preserves
    recipe order for ``stats()``.

    ``pinned_rdd_ids`` is non-empty only when the recipe exceeded
    ``plan_cut_after`` loser stages and switched to lineage-cutting
    checkpoints: the LAST cut's blocks stay pinned (truncated lineage is
    unrecomputable) and back ``annotated``'s plan. Call :meth:`release`
    ONLY after fully consuming the result (write/collect done) — after
    release, further actions on ``annotated``/``clean`` fail rather than
    recompute."""

    annotated: DataFrame
    stage_names: list
    pinned_rdd_ids: set = None  # set[int] | None

    def release(self) -> None:
        """Free the final lineage cut's pinned blocks (no-op when the
        recipe stayed under ``plan_cut_after``). Only call once every
        consumer of ``annotated``/``clean`` has run."""
        if self.pinned_rdd_ids:
            unpersist_ids(self.annotated, self.pinned_rdd_ids)
            self.pinned_rdd_ids = set()

    @property
    def clean(self) -> DataFrame:
        return self.annotated.where(
            F.col(_REJECT_COL).isNull()).drop(_REJECT_COL)

    def stats(self) -> DataFrame:
        """(stage, n_rejected) per stage in recipe order plus a final
        ``(NULL, n_kept)`` row — ONE groupBy over the annotated frame."""
        order = {n: i for i, n in enumerate(self.stage_names)}
        m = F.create_map(
            *[x for n, i in order.items() for x in (F.lit(n), F.lit(i))])
        return (
            self.annotated.groupBy(F.col(_REJECT_COL).alias("stage"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.coalesce(m[F.col("stage")], F.lit(len(order))))
        )


def run_recipe(
    df: DataFrame,
    stages: list[RecipeStage],
    id_col: str,
    *,
    plan_cut_after: int = 8,
) -> RecipeResult:
    """Run ``stages`` in order over ``df`` with first-rejecting-stage
    attribution.

    Consecutive predicate stages cost ZERO extra jobs (they fold into
    the one label expression); each loser stage costs its own fn plus
    one id-keyed left join. ``id_col`` must be unique for loser-stage
    attribution to be well-defined (it is the join key).

    The first ``plan_cut_after`` loser stages materialize their prefix
    with an evictable persist (branch reuse, NOT a lineage cut — nothing
    stays pinned, but the logical plan keeps growing, so driver-side
    analysis cost rises roughly quadratically with loser-stage count).
    Beyond the threshold the recipe switches to lineage-CUTTING
    checkpoints, freeing every earlier cut of this run once the new one
    is materialized: plan size and pinned storage both stay bounded at
    one working-set copy regardless of stage count. The final cut's
    blocks remain pinned (they back the returned frames) —
    ``RecipeResult.release()`` frees them after consumption.
    ``plan_cut_after=0`` forces cut-mode from the first loser stage."""
    names = [s.name for s in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    if _REJECT_COL in df.columns:
        raise ValueError(
            f"input already has a {_REJECT_COL!r} column — rename it before "
            "running a recipe (it is the recipe's lineage output column)")
    annotated = df.withColumn(_REJECT_COL, F.lit(None).cast("string"))
    rej = F.col(_REJECT_COL)
    loser_seen = 0
    my_fused: list[DataFrame] = []
    prev_tracked: set[int] = set()
    for stage in stages:
        if stage.kind == "predicate":
            keep = stage.fn(annotated)
            # NULL-safe: only an explicit TRUE keeps the row
            annotated = annotated.withColumn(
                _REJECT_COL,
                F.coalesce(
                    rej,
                    F.when(~keep.eqNullSafe(F.lit(True)),
                           F.lit(stage.name))),
            )
        elif stage.kind == "losers":
            # materialize the prefix so the fn and the join read blocks
            # instead of re-running the accumulated chain. Under the
            # threshold: evictable persist (branch reuse, nothing pinned,
            # plan keeps growing). Over it: lineage cut + free every
            # earlier cut of THIS run (the new eager cut makes them
            # unreachable from the plan), bounding both plan size and
            # pinned storage for many-loser-stage recipes.
            loser_seen += 1
            if loser_seen <= plan_cut_after:
                annotated = annotated.transform(fused_checkpoint)
                my_fused.append(annotated)
            else:
                annotated, new_ids = tracked_checkpoint(annotated, eager=True)
                unpersist_ids(annotated, prev_tracked)
                for f in my_fused:
                    f.unpersist()
                my_fused = []
                prev_tracked = new_ids
            survivors = annotated.where(rej.isNull())
            import inspect

            try:
                # id_col is passed only where the fn REQUIRES it: (a) a
                # second required positional, or (b) a required (no
                # default) parameter literally named ``id_col`` — passed
                # by keyword so keyword-only signatures work. A DEFAULTED
                # or partial-bound id_col is an explicit caller choice and
                # is honored, never overridden; a fn like ``lambda s,
                # frac=0.5: ...`` stays one-arg (its second slot is its
                # own default, not a request for id_col).
                params = inspect.signature(stage.fn).parameters
                positional = [
                    p for p in params.values()
                    if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
                required = [p for p in positional if p.default is p.empty]
                two_positional = len(required) >= 2
                # the FIRST positional is the survivors slot, whatever its
                # name — only a LATER required param named id_col opts in
                first = positional[0].name if positional else None
                id_kw = any(
                    p.name == "id_col" and p.name != first
                    and p.default is p.empty
                    and p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
                    for p in params.values())
            except (TypeError, ValueError):
                two_positional = id_kw = False  # unintrospectable: classic
            if two_positional:
                losers = stage.fn(survivors, id_col)
            elif id_kw:
                losers = stage.fn(survivors, id_col=id_col)
            else:
                losers = stage.fn(survivors)
            lcol = losers.columns[0]
            ltab = (
                losers.select(F.col(lcol).alias("__loser_id"))
                .where(F.col("__loser_id").isNotNull())
                .distinct()
            )
            annotated = (
                annotated.join(
                    ltab,
                    F.col(id_col).eqNullSafe(F.col("__loser_id")) & rej.isNull(),
                    "left",
                )
                .withColumn(
                    _REJECT_COL,
                    F.coalesce(
                        rej,
                        F.when(F.col("__loser_id").isNotNull(),
                               F.lit(stage.name))),
                )
                .drop("__loser_id")
            )
        else:
            raise ValueError(f"unknown stage kind {stage.kind!r}")
    return RecipeResult(
        annotated=annotated, stage_names=names, pinned_rdd_ids=prev_tracked)
