"""Static int64-overflow lint over every registered query's analyzed
plan (the r11 e24 lesson, generalized): a product of two NON-LITERAL
bigint expressions multiplies two value-scaled quantities — when both
factors scale with data volume (counts, sums), the product grows with
SF^2 and crosses 2^63 while each factor is far below it, so the query
is hash-green at every gate SF and fails (ANSI) or silently corrupts
(non-ANSI) only at the 100x probe. e24's `(num*100)^2` was exactly
this shape.

Rule: flag `Multiply` nodes whose RESULT type is bigint and whose
operands are both non-literal (literals are stripped through casts —
`count(1) * 100` stays legal; boundedness then rests on the factor,
which overflow cannot reach through a single literal scale). Legal
resolutions, in preference order:

1. compute the cross term in decimal(38,0) (e24's fix,
   queries/events.py) — 38 digits absorbs any product of two int64s;
2. audit the bound: add the site to AUDITED with a comment proving
   both factors are bounded by construction (key domains, literal
   caps), never by corpus size.

ANSI mode is pinned ON in ice_spark.session.get_spark and asserted in
every gate/bench/probe entrypoint (session.assert_ansi), so a missed
site fails loudly instead of corrupting; this lint moves the failure
from a 100x-scale probe to plan-time CI at sf0.001.

Usage: python tools/lint_overflow.py [sf_dir]   (exit 1 on findings)
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# query name -> set of flagged multiply SQL signatures audited as
# bounded by construction. Signature = the Multiply expression's
# .sql() on the analyzed plan (stable: no exprIds). Keep every entry
# commented with the bound.

# TPC-H revenue formula: cents(l_extendedprice) <= ~1e7 (price is a
# per-ROW value bounded by the part-price domain, never a sum) x
# discount/tax bp <= 2e4 -> <= 2e11 per row; q01's triple product
# <= 4e15. Bounded by the value domain at ANY corpus size.
_REVENUE = (
    "(CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT) * "
    "(CAST(10000 AS BIGINT) - "
    "CAST(round((l_discount * CAST(10000 AS DOUBLE)), 0) AS BIGINT)))"
)
_REVENUE_TAX = (
    f"({_REVENUE} * "
    "(CAST(round((l_tax * CAST(10000 AS DOUBLE)), 0) AS BIGINT) "
    "+ CAST(10000 AS BIGINT)))"
)

# operators/ranking.global_ntile's offsets arithmetic:
# (rank % k) <= k-1 (k = tile count, a literal) x (n/k + 1) ~ n/k
# -> product <= ~n, LINEAR in corpus rows, not quadratic; overflows
# only past ~9e18 rows (beyond any addressable corpus).
def _ntile(k: int) -> str:
    return (
        f"((__gr_rank_n % CAST({k} AS BIGINT)) * "
        f"(CAST((CAST(__gr_rank_n AS DOUBLE) / CAST({k} AS DOUBLE)) "
        f"AS BIGINT) + CAST(1 AS BIGINT)))"
    )


AUDITED: dict[str, set[str]] = {
    "w01_top_customers_per_nation": {_REVENUE},
    "j01_bloom_semijoin_revenue": {_REVENUE},
    "q01_pricing_summary": {_REVENUE, _REVENUE_TAX},
    "q03_shipping_priority": {_REVENUE},
    "q05_local_supplier_volume": {_REVENUE},
    # cents(price) x discount bp <= 1e7 x 1e4 = 1e11 per row
    "q06_forecast_revenue": {
        "(CAST(round((l_extendedprice * CAST(100 AS DOUBLE)), 0) AS BIGINT)"
        " * CAST(round((l_discount * CAST(10000 AS DOUBLE)), 0) AS BIGINT))"
    },
    "q11_important_parts": {_REVENUE},
    "a05_order_value_deciles": {_ntile(10)},
    "e20_rfm_segmentation": {_ntile(4)},
    "e21_time_to_convert": {_ntile(10)},
    "w10_lorenz_gini_deciles": {_ntile(10)},
    # per-order line ordinal (<= 7, l_linenumber domain) x qty (<= 50)
    "f13_array_ordinality": {"(CAST((pos0 + 1) AS BIGINT) * pair.`qty`)"},
    # image dimensions: width x height bounded by the decoder's pixel
    # budget (<= ~1e5 each side), never corpus-scaled
    "m01_media_pipeline": {
        "(CAST(meta.`width` AS BIGINT) * CAST(meta.`height` AS BIGINT))"
    },
    "m03_patch_grid": {"(CAST(patch_w AS BIGINT) * CAST(patch_h AS BIGINT))"},
    # count-min hash: (key % P) < 2^31 x a < 2^31 -> < 2^62 by the
    # hash-family construction (P = 2147483647)
    "k02_countmin_heavy_hitters": {
        "((o_custkey % CAST(2147483647 AS BIGINT)) * CAST(p.`a` AS BIGINT))"
    },
    # group count x one parsed DIGIT: try_cast(substring(flag,1,1))
    # yields NULL or 0-9 (coalesced to 0), so the product is <= 9n —
    # linear in corpus rows, same envelope as the ntile sites
    "f14_try_functions": {
        "(cnt * CAST(coalesce(TRY_CAST(substring(l_returnflag, 1, 1) "
        "AS INT), 0) AS BIGINT))"
    },
    # percentile-rank arithmetic: n (count, linear) x p_num <= 99
    # (from the 3-row percentile-spec VALUES relation) -> <= 99n,
    # linear in corpus rows
    "k12_log_histogram_percentiles": {"(n * p_num)"},
    "k13_hash_sample_quantiles": {"(k * p_num)"},
    # quantized unit-norm embedding micro-units: |cu|,|v_u|,|c_u|
    # <= 1e6 by the quantization domain -> products <= 4e12, summed
    # over <= embedding-dim (64) terms
    "v09_centroid_pairwise_cosine": {"(a.cu * b.cu)", "(cu * cu)"},
    "v15_centroid_classifier_audit": {"((v_u - c_u) * (v_u - c_u))"},
    "v17_embedding_space_audit": {"(v_u * v_u)"},
}


def _strip(e):
    """See through Cast/Alias wrappers to the underlying expression."""
    while e.getClass().getSimpleName() in ("Cast", "Alias", "AnsiCast"):
        e = e.children().apply(0)
    return e


def _is_literal(e) -> bool:
    return _strip(e).getClass().getSimpleName() == "Literal"


def long_long_multiplies(df) -> list[str]:
    """SQL signatures of bigint Multiply nodes with two non-literal
    operands anywhere in the analyzed logical plan (dedup'd)."""
    plan = df._jdf.queryExecution().analyzed()
    found: list[str] = []
    seen: set[str] = set()

    def walk_expr(e) -> None:
        if (
            e.getClass().getSimpleName() == "Multiply"
            and e.dataType().simpleString() == "bigint"
        ):
            kids = [e.children().apply(i) for i in range(e.children().size())]
            if not any(_is_literal(k) for k in kids):
                try:
                    s = e.sql()
                except Exception:
                    s = e.toString()
                if s not in seen:
                    seen.add(s)
                    found.append(s)
        ch = e.children()
        for i in range(ch.size()):
            walk_expr(ch.apply(i))

    def walk_plan(p) -> None:
        ex = p.expressions()
        for i in range(ex.size()):
            walk_expr(ex.apply(i))
        ch = p.children()
        for i in range(ch.size()):
            walk_plan(ch.apply(i))
        # CTE/subquery bodies where present (best-effort: the registry
        # queries build everything through the DataFrame API, so
        # subquery expressions are rare)
        try:
            sq = p.subqueries()
            for i in range(sq.size()):
                walk_plan(sq.apply(i))
        except Exception:
            pass

    walk_plan(plan)
    return found


def unaudited_multiplies(name: str, df) -> list[str]:
    allowed = AUDITED.get(name, set())
    return [s for s in long_long_multiplies(df) if s not in allowed]


def main() -> int:
    from ice_spark.queries.registry import load_all
    from ice_spark.session import assert_ansi, get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lint_overflow")
    assert_ansi(spark)
    problems: dict[str, list[str]] = {}
    for name, spec in load_all().items():
        bad = unaudited_multiplies(name, spec.spark_fn(spark, sf_dir))
        if bad:
            problems[name] = bad
    for name, bad in problems.items():
        for s in bad:
            print(f"OVERFLOW-RISK {name}: bigint product of two "
                  f"non-literal factors: {s}")
    print(f"{sum(len(v) for v in problems.values())} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
