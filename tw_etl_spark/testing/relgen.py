"""Seeded relational query generator for cross-engine differential
testing (SQLancer-style).

Round 8 shipped two red driver rows because the *fixed* oracle corpus
couldn't exercise every cross-engine semantic edge (DECIMAL widening,
signed zero).  The strict harness (tests/oracle_utils.py) now catches
those classes — this module generates the *queries*: random logical
plans over the fixture tables, rendered in a restricted ANSI subset on
which Spark SQL and DuckDB agree EXACTLY, so thousands of
projection/filter/agg/join shapes can be hash-compared between engines
instead of the hand-written 113.

The dialect subset is the load-bearing design decision.  Everything the
generator can emit was chosen (and the exclusions documented) so that a
mismatch is a real engine/harness bug, not dialect noise:

- integer arithmetic only via ``+ - *`` with literal-bounded
  multiplicands (ANSI overflow-safe in both engines: |value| stays well
  under 2^63 at any fixture SF);
- ``abs(x) % k`` with literal ``k >= 2`` — sign-of-dividend rules never
  fire, no division-by-zero;
- NO division (Spark ``/`` yields DOUBLE, DuckDB too, but 0-denominator
  -> Infinity-vs-NULL differences), NO double->int CAST (Spark
  truncates, DuckDB rounds half-even);
- ``SUM`` always wrapped ``CAST(SUM(..) AS BIGINT)`` (DuckDB widens
  BIGINT sums to HUGEINT — the dd4p lesson);
- float arithmetic allowed ROW-LEVEL only (IEEE-deterministic per row);
  float *aggregates* restricted to MIN/MAX (order-independent);
- string ops on ASCII fixture columns only; comparisons restricted to
  ``= <> LIKE IN`` (binary collation agreement is then trivial);
- ``||`` for concat (NULL-propagating in both; ``concat()`` is not:
  DuckDB treats NULL as '');
- NULLs are *injected* via NULLIF (the fixtures are non-null), so
  three-valued logic, IS [NOT] NULL, COALESCE and null-safe aggregation
  are genuinely exercised;
- ORDER BY every output alias ASC NULLS FIRST before any LIMIT (full
  tiebreak; Spark's default null ordering differs from DuckDB's);
- GROUP BY is positional (``GROUP BY 1``) — alias-vs-expression group
  resolution differs across dialects.

Determinism: every query is a pure function of an integer seed
(``random.Random(seed)``), so a failure reproduces from its seed number
and CI pins a fixed seed range.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tw_etl_spark.catalog import read_table

# Fuzzable fixture columns by type.  events is excluded (nano-timestamp
# normalization makes its Spark view a *derived* table — read_table
# handles it, but the point here is engine parity on identical scans);
# documents.text is excluded from projections (payload-sized cells slow
# the hash without adding semantics beyond what lang/source cover).
TABLE_COLS: dict[str, dict[str, list[str]]] = {
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "float": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
    },
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "float": ["c_acctbal"],
        "str": ["c_name", "c_mktsegment"],
        "ts": [],
    },
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "float": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "str": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
    },
    "documents": {
        "int": ["doc_id", "n_chars"],
        "float": [],
        "str": ["lang", "source"],
        "ts": [],
    },
}

# Literal pools: mix of values that exist in the fixtures (selective
# predicates) and values that don't (empty-result paths are valid
# differential tests too).
_STR_LITERALS = [
    "F", "O", "P", "A", "N", "R", "en", "de", "web", "BUILDING",
    "1-URGENT", "Customer#", "zzz-not-present",
]
_LIKE_PATTERNS = ["%a%", "A%", "%1", "%e_", "Cu%", "%#00%", "%zqx%"]

JOINS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
]

# Per-table unique key: appended to window ORDER BY clauses so
# ROW_NUMBER / LAG / LEAD orderings are total (deterministic in both
# engines).  RANK/DENSE_RANK don't need it (ties share a rank).
# lineitem is deliberately ABSENT: its nominal (l_orderkey,
# l_linenumber) key is NOT unique in the fixtures (measured 6000 rows /
# 4599 distinct pairs at sf0.001), so no total order exists and
# sequence-sensitive window results would be engine-dependent — seed
# 414 of the first wide sweep caught exactly that.  Window shapes are
# generated only over these tables.
UNIQUE_KEYS = {
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
}


@dataclass
class FuzzQuery:
    """One generated query: a SQL string valid (and semantics-identical)
    in both Spark SQL and DuckDB, the tables it reads, and the query
    shape (for reporting).

    ``parts`` carries the structured form (projections, predicate, join
    spec, grouping arity, order/limit) for shapes the DataFrame API can
    re-express directly; it is None for SQL-only shapes (set ops,
    subqueries, DISTINCT, HAVING, ROLLUP/CUBE/GROUPING SETS)."""

    seed: int
    sql: str
    tables: tuple[str, ...]
    shape: str  # scan | agg | join | join_agg | window | setop | subq | distinct
    parts: "QueryParts | None" = None


@dataclass
class QueryParts:
    """Structured query components for the DataFrame re-expression."""

    projs: list[str]  # aliased projection/agg expressions, in order
    where: str | None = None
    join: tuple[str, str, str, str, str] | None = None  # left, right, lk, rk, how
    n_keys: int = 0  # leading projs that are GROUP BY keys (0 = no agg)
    limit: int | None = None


class _Gen:
    def __init__(self, rng: random.Random, table: str):
        self.rng = rng
        self.cols = TABLE_COLS[table]

    # -- scalar integer expressions (BIGINT-kind in both engines) -----
    def int_expr(self, depth: int = 0) -> str:
        r = self.rng
        leaf_choices = ["col", "lit"]
        if self.cols["str"]:
            leaf_choices.append("length")
        if self.cols["ts"]:
            leaf_choices.append("extract")
        if depth >= 3:
            kind = r.choice(leaf_choices)
        else:
            kind = r.choice(
                leaf_choices
                + ["add", "sub", "mul_lit", "mod", "case", "coalesce", "nullif"]
            )
        if kind == "col" and self.cols["int"]:
            # CAST pins INTEGER cols to BIGINT so +/- never overflows
            # 32-bit intermediates under ANSI mode.
            return f"CAST({r.choice(self.cols['int'])} AS BIGINT)"
        if kind == "length":
            return f"LENGTH({r.choice(self.cols['str'])})"
        if kind == "extract":
            fn = r.choice(["YEAR", "MONTH", "DAY"])
            return f"CAST({fn}({r.choice(self.cols['ts'])}) AS BIGINT)"
        if kind == "add":
            return f"({self.int_expr(depth + 1)} + {self.int_expr(depth + 1)})"
        if kind == "sub":
            return f"({self.int_expr(depth + 1)} - {self.int_expr(depth + 1)})"
        if kind == "mul_lit":
            # multiplicand bounded so depth-3 nesting stays << 2^63
            return f"({self.int_expr(depth + 1)} * {r.randint(-9, 9)})"
        if kind == "mod":
            return f"(ABS({self.int_expr(depth + 1)}) % {r.randint(2, 97)})"
        if kind == "case":
            return (
                f"CASE WHEN {self.bool_expr(depth + 1)} "
                f"THEN {self.int_expr(depth + 1)} "
                f"ELSE {self.int_expr(depth + 1)} END"
            )
        if kind == "coalesce":
            return f"COALESCE({self.int_expr(depth + 1)}, {r.randint(-100, 100)})"
        if kind == "nullif":
            # primary NULL injector: NULLIF(abs(e) % k, m) is NULL on a
            # predictable residue class in BOTH engines
            k = r.randint(2, 13)
            return (
                f"NULLIF((ABS({self.int_expr(depth + 1)}) % {k}), "
                f"{r.randint(0, k - 1)})"
            )
        return str(r.randint(-1000, 1000))

    # -- scalar float expressions (row-level IEEE ops only) -----------
    def float_expr(self, depth: int = 0) -> str:
        r = self.rng
        if not self.cols["float"]:
            return f"CAST({self.int_expr(depth)} AS DOUBLE)"
        if depth >= 2 or r.random() < 0.45:
            return r.choice(self.cols["float"])
        op = r.choice(["+", "-", "*"])
        return f"({self.float_expr(depth + 1)} {op} {self.float_expr(depth + 1)})"

    # -- string expressions (ASCII-only columns) ----------------------
    def str_expr(self) -> str:
        r = self.rng
        col = r.choice(self.cols["str"])
        kind = r.choice(["col", "upper", "lower", "substr", "concat"])
        if kind == "upper":
            return f"UPPER({col})"
        if kind == "lower":
            return f"LOWER({col})"
        if kind == "substr":
            return f"SUBSTR({col}, {r.randint(1, 4)}, {r.randint(0, 6)})"
        if kind == "concat":
            other = r.choice(self.cols["str"])
            return f"({col} || '-' || {other})"
        return col

    # -- boolean expressions ------------------------------------------
    def bool_expr(self, depth: int = 0) -> str:
        r = self.rng
        if depth >= 3:
            kinds = ["int_cmp", "str_eq"]
        else:
            kinds = [
                "int_cmp", "int_cmp", "between", "str_eq", "like", "in",
                "float_cmp", "is_null", "and", "or", "not",
            ]
        kind = r.choice(kinds)
        if kind == "int_cmp":
            op = r.choice(["<", "<=", "=", "<>", ">", ">="])
            return f"({self.int_expr(depth + 1)} {op} {self.int_expr(depth + 1)})"
        if kind == "between":
            lo = r.randint(-50, 500)
            return f"({self.int_expr(depth + 1)} BETWEEN {lo} AND {lo + r.randint(0, 500)})"
        if kind == "str_eq":
            op = r.choice(["=", "<>"])
            return f"({self.str_expr()} {op} '{r.choice(_STR_LITERALS)}')"
        if kind == "like":
            return f"({self.rng.choice(self.cols['str'])} LIKE '{r.choice(_LIKE_PATTERNS)}')"
        if kind == "in":
            n = r.randint(1, 3)
            lits = ", ".join(f"'{r.choice(_STR_LITERALS)}'" for _ in range(n))
            return f"({self.rng.choice(self.cols['str'])} IN ({lits}))"
        if kind == "float_cmp" and self.cols["float"]:
            op = r.choice(["<", ">", "<=", ">="])
            lit = round(r.uniform(-1000, 10000), 2)
            return f"({r.choice(self.cols['float'])} {op} {lit})"
        if kind == "is_null":
            neg = r.choice(["", " NOT"])
            return f"({self.int_expr(depth + 1)} IS{neg} NULL)"
        if kind == "and":
            return f"({self.bool_expr(depth + 1)} AND {self.bool_expr(depth + 1)})"
        if kind == "or":
            return f"({self.bool_expr(depth + 1)} OR {self.bool_expr(depth + 1)})"
        if kind == "not":
            return f"(NOT {self.bool_expr(depth + 1)})"
        return f"({self.int_expr(depth + 1)} < {self.int_expr(depth + 1)})"

    def proj_expr(self) -> str:
        kind = self.rng.choice(["int", "int", "str", "float", "bool"])
        if kind == "int":
            return self.int_expr()
        if kind == "str":
            return self.str_expr()
        if kind == "float" and self.cols["float"]:
            return self.float_expr()
        if kind == "bool":
            return f"({self.bool_expr()})"
        return self.int_expr()


class _JoinGen(_Gen):
    """Expression generator whose column pool spans both join sides —
    column names are globally unique across the fixture tables, so no
    qualification is needed and the same SQL parses in both engines."""

    def __init__(self, rng: random.Random, left: str, right: str):
        self.rng = rng
        self.cols = {
            k: TABLE_COLS[left][k] + TABLE_COLS[right][k]
            for k in ("int", "float", "str", "ts")
        }


def _order_and_limit(
    rng: random.Random, n_cols: int, allow_limit: bool = True
) -> tuple[str, int | None]:
    order = ", ".join(f"c{i} ASC NULLS FIRST" for i in range(n_cols))
    sql = f" ORDER BY {order}"
    limit = None
    if allow_limit and rng.random() < 0.5:
        # full-tuple tiebreak above means any LIMIT prefix is unique up
        # to identical rows, which hash identically
        limit = rng.randint(1, 200)
        sql += f" LIMIT {limit}"
    return sql, limit


def _agg_items(g: _Gen, rng: random.Random) -> list[str]:
    items = []
    n = rng.randint(1, 4)
    for _ in range(n):
        kind = rng.choice(["sum", "cnt", "cntd", "min_int", "max_int", "minmax_float"])
        if kind == "sum":
            items.append(f"CAST(SUM({g.int_expr()}) AS BIGINT)")
        elif kind == "cnt":
            items.append(f"COUNT({g.int_expr()})" if rng.random() < 0.5 else "COUNT(*)")
        elif kind == "cntd":
            items.append(f"COUNT(DISTINCT {g.int_expr()})")
        elif kind == "min_int":
            items.append(f"MIN({g.int_expr()})")
        elif kind == "max_int":
            items.append(f"MAX({g.int_expr()})")
        else:
            fn = rng.choice(["MIN", "MAX"])
            if g.cols["float"]:
                items.append(f"{fn}({rng.choice(g.cols['float'])})")
            else:
                items.append(f"{fn}({g.int_expr()})")
    return items


def _window_items(g: _Gen, rng: random.Random, table: str) -> list[str]:
    """Window expressions whose results are deterministic: RANK and
    DENSE_RANK tie-share (any order expr is fine); ROW_NUMBER, LAG and
    LEAD get the table's unique key appended for a total order;
    partition-wide SUM/COUNT are order-free (SUM cast to BIGINT — DuckDB
    widens window sums to HUGEINT just like plain ones)."""
    part = f"(ABS({g.int_expr()}) % {rng.randint(2, 8)})"
    order_expr = g.int_expr()
    uniq = ", ".join(f"{k} ASC NULLS FIRST" for k in UNIQUE_KEYS[table])
    total_order = f"{order_expr} ASC NULLS FIRST, {uniq}"
    items = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["row_number", "rank", "dense_rank", "lag", "lead", "psum", "pcount"])
        if kind == "row_number":
            items.append(f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {total_order})")
        elif kind == "rank":
            items.append(
                f"RANK() OVER (PARTITION BY {part} ORDER BY {order_expr} ASC NULLS FIRST)"
            )
        elif kind == "dense_rank":
            items.append(
                f"DENSE_RANK() OVER (PARTITION BY {part} ORDER BY {order_expr} ASC NULLS FIRST)"
            )
        elif kind == "lag":
            items.append(
                f"LAG({g.int_expr()}, 1) OVER (PARTITION BY {part} ORDER BY {total_order})"
            )
        elif kind == "lead":
            items.append(
                f"LEAD({g.int_expr()}, 1) OVER (PARTITION BY {part} ORDER BY {total_order})"
            )
        elif kind == "psum":
            items.append(
                f"CAST(SUM({g.int_expr()}) OVER (PARTITION BY {part}) AS BIGINT)"
            )
        else:
            items.append(f"COUNT(*) OVER (PARTITION BY {part})")
    return items


# Shape weights.  scan/agg/join exercise the core; window/setop/subq/
# distinct exercise the analytic, set-semantics and subquery planners.
_SHAPES = [
    "scan", "scan", "agg", "agg", "join", "join_agg",
    "window", "window", "setop", "subq", "distinct",
]

SHAPES = tuple(dict.fromkeys(_SHAPES))


def generate(seed: int) -> FuzzQuery:
    """Generate one deterministic differential query from a seed."""
    rng = random.Random(seed)
    shape = rng.choice(_SHAPES)

    if shape in ("join", "join_agg"):
        left, right, lk, rk = rng.choice(JOINS)
        g: _Gen = _JoinGen(rng, left, right)
        tables: tuple[str, ...] = (left, right)
        how = rng.choice(["JOIN", "JOIN", "LEFT JOIN"])
        from_clause = f"{left} {how} {right} ON {lk} = {rk}"
    else:
        table = rng.choice(list(TABLE_COLS))
        g = _Gen(rng, table)
        tables = (table,)
        from_clause = table

    where = f" WHERE {g.bool_expr()}" if rng.random() < 0.85 else ""

    join_spec = None
    if shape in ("join", "join_agg"):
        join_spec = (left, right, lk, rk, "left" if how == "LEFT JOIN" else "inner")
    bare_where = where[len(" WHERE "):] if where else None

    if shape in ("scan", "join"):
        n_proj = rng.randint(1, 5)
        projs = [f"{g.proj_expr()} AS c{i}" for i in range(n_proj)]
        tail, limit = _order_and_limit(rng, n_proj)
        sql = f"SELECT {', '.join(projs)} FROM {from_clause}{where}{tail}"
        parts = QueryParts(projs=projs, where=bare_where, join=join_spec, limit=limit)
    elif shape in ("agg", "join_agg"):
        n_keys = rng.choice([1, 1, 2])
        keys = []
        for _ in range(n_keys):
            if rng.random() < 0.5:
                keys.append(f"(ABS({g.int_expr()}) % {rng.randint(2, 12)})")
            else:
                keys.append(g.str_expr())
        aggs = _agg_items(g, rng)
        grouping_variant = None
        if n_keys == 2 and rng.random() < 0.4:
            grouping_variant = rng.choice(["ROLLUP", "CUBE", "GROUPING SETS"])
        if grouping_variant:
            # super-aggregate shapes: repeat the key expressions in the
            # grouping clause (positional refs are not valid inside
            # ROLLUP in both dialects) and disambiguate data-NULL keys
            # from super-aggregate NULL keys with GROUPING() columns
            # (TINYINT in Spark, BIGINT in DuckDB -> cast both).
            # NO WHERE clause here — a documented engine divergence the
            # first fuzz sweep of these shapes found: over an EMPTY
            # input, DuckDB (like PostgreSQL, per the SQL standard)
            # emits the () grouping-set grand-total row, Spark emits
            # zero rows (tests/test_differential_fuzz.py::
            # test_known_divergence_rollup_on_empty_input pins it).
            # Fixture tables are non-empty, so dropping WHERE keeps the
            # generated queries out of the divergent case.
            where = ""
            if grouping_variant == "GROUPING SETS":
                group = (
                    f"GROUPING SETS (({keys[0]}, {keys[1]}), ({keys[0]}), ())"
                )
            else:
                group = f"{grouping_variant} ({keys[0]}, {keys[1]})"
            cols = (
                [f"{k} AS c{i}" for i, k in enumerate(keys)]
                + [
                    f"CAST(GROUPING({k}) AS BIGINT) AS c{i + 2}"
                    for i, k in enumerate(keys)
                ]
                + [f"{a} AS c{i + 4}" for i, a in enumerate(aggs)]
            )
            tail, _ = _order_and_limit(rng, len(cols), allow_limit=False)
            sql = (
                f"SELECT {', '.join(cols)} FROM {from_clause}{where} "
                f"GROUP BY {group}{tail}"
            )
            parts = None  # SQL-only (DataFrame rollup()/cube() exist but
            # GROUPING() on expression keys doesn't round-trip F.expr)
        else:
            cols = [f"{k} AS c{i}" for i, k in enumerate(keys)] + [
                f"{a} AS c{i + n_keys}" for i, a in enumerate(aggs)
            ]
            group = ", ".join(str(i + 1) for i in range(n_keys))
            having = (
                f" HAVING COUNT(*) > {rng.randint(0, 20)}" if rng.random() < 0.4 else ""
            )
            tail, _ = _order_and_limit(rng, len(cols), allow_limit=False)
            sql = (
                f"SELECT {', '.join(cols)} FROM {from_clause}{where} "
                f"GROUP BY {group}{having}{tail}"
            )
            parts = (
                None
                if having
                else QueryParts(
                    projs=cols, where=bare_where, join=join_spec, n_keys=n_keys
                )
            )
    elif shape == "window":
        if tables[0] not in UNIQUE_KEYS:
            table = rng.choice(sorted(UNIQUE_KEYS))
            g = _Gen(rng, table)
            tables = (table,)
            from_clause = table
            where = f" WHERE {g.bool_expr()}" if rng.random() < 0.85 else ""
            bare_where = where[len(" WHERE "):] if where else None
        items = _window_items(g, rng, tables[0])
        uniq_cols = UNIQUE_KEYS[tables[0]]
        cols = [f"{c} AS c{i}" for i, c in enumerate(uniq_cols + items)]
        tail, limit = _order_and_limit(rng, len(cols))
        sql = f"SELECT {', '.join(cols)} FROM {from_clause}{where}{tail}"
        parts = QueryParts(projs=cols, where=bare_where, limit=limit)
    elif shape == "setop":
        op = rng.choice(["UNION ALL", "UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        # identical projections on both branches => identical types (a
        # set-op type-resolution mismatch can't produce dialect noise);
        # float exprs excluded: set semantics compare cells for equality
        # and we don't want -0.0/0.0 representative-choice in play
        n_proj = rng.randint(1, 3)
        projs = []
        for _ in range(n_proj):
            projs.append(g.int_expr() if rng.random() < 0.6 else g.str_expr())
        branch = "SELECT " + ", ".join(f"{p} AS c{i}" for i, p in enumerate(projs))
        where2 = f" WHERE {g.bool_expr()}" if rng.random() < 0.85 else ""
        tail, _ = _order_and_limit(rng, n_proj, allow_limit=False)
        sql = (
            f"{branch} FROM {from_clause}{where} {op} "
            f"{branch} FROM {from_clause}{where2}{tail}"
        )
        parts = None
    elif shape == "subq":
        # IN / NOT IN / EXISTS / NOT EXISTS against the table's join
        # partner; subquery keys are non-null fixture PKs, so NOT IN's
        # null-aware semantics agree trivially
        outer, inner, fk, pk = rng.choice(JOINS)
        g = _Gen(rng, outer)
        gi = _Gen(rng, inner)
        tables = (outer, inner)
        kind = rng.choice(["in", "not_in", "exists", "not_exists"])
        inner_where = f" WHERE {gi.bool_expr()}" if rng.random() < 0.7 else ""
        if kind in ("in", "not_in"):
            neg = "NOT " if kind == "not_in" else ""
            pred = f"{fk} {neg}IN (SELECT {pk} FROM {inner}{inner_where})"
        else:
            neg = "NOT " if kind == "not_exists" else ""
            corr = f"{pk} = {fk}"
            extra = f" AND {gi.bool_expr()}" if rng.random() < 0.7 else ""
            pred = f"{neg}EXISTS (SELECT 1 FROM {inner} WHERE {corr}{extra})"
        outer_pred = f" AND {g.bool_expr()}" if rng.random() < 0.5 else ""
        n_proj = rng.randint(1, 3)
        projs = [f"{g.proj_expr()} AS c{i}" for i in range(n_proj)]
        tail, _ = _order_and_limit(rng, n_proj)
        sql = (
            f"SELECT {', '.join(projs)} FROM {outer} WHERE {pred}{outer_pred}{tail}"
        )
        parts = None
    else:  # distinct
        n_proj = rng.randint(1, 3)
        projs = []
        for _ in range(n_proj):
            # int/str/bool only: set semantics on floats would hinge on
            # which -0.0/0.0 representative survives
            k = rng.choice(["int", "int", "str", "bool"])
            if k == "int":
                projs.append(g.int_expr())
            elif k == "str":
                projs.append(g.str_expr())
            else:
                projs.append(f"({g.bool_expr()})")
        cols = [f"{p} AS c{i}" for i, p in enumerate(projs)]
        tail, _ = _order_and_limit(rng, n_proj, allow_limit=False)
        sql = f"SELECT DISTINCT {', '.join(cols)} FROM {from_clause}{where}{tail}"
        parts = None
    return FuzzQuery(seed=seed, sql=sql, tables=tables, shape=shape, parts=parts)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create temp views for the fuzzable tables (catalog-normalized
    reads, same path every registered query uses)."""
    for t in TABLE_COLS:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_spark_sql(spark: SparkSession, q: FuzzQuery, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(q.sql)


def run_spark_dataframe(spark: SparkSession, q: FuzzQuery, sf_dir: str) -> DataFrame | None:
    """Re-express the generated query through the DataFrame API (the
    engine's native idiom) from its structured ``parts``: scan/window
    shapes become where/selectExpr/orderBy/limit (selectExpr accepts
    OVER clauses), agg shapes become where/groupBy/agg, join shapes
    become read.join(read).  Returns None for SQL-only shapes
    (``parts is None``): subqueries can't be expressed through F.expr
    in a where(); set ops / DISTINCT / HAVING / ROLLUP have DataFrame
    verbs but re-deriving them adds translation surface, not engine
    surface.

    This gives a three-way differential: Spark-SQL vs Spark-DataFrame
    (two distinct logical-plan constructions through one Catalyst) vs
    DuckDB.
    """
    p = q.parts
    if p is None:
        return None
    if p.join is not None:
        left, right, lk, rk, how = p.join
        df = read_table(spark, sf_dir, left).join(
            read_table(spark, sf_dir, right), on=F.col(lk) == F.col(rk), how=how
        )
    else:
        df = read_table(spark, sf_dir, q.tables[0])
    if p.where:
        df = df.where(F.expr(p.where))

    def unalias(proj: str, i: int):
        # the alias is always the LAST " AS " (CAST(x AS BIGINT) has
        # earlier ones)
        return F.expr(proj[: proj.rindex(" AS ")]).alias(f"c{i}")

    if p.n_keys:
        grp = [unalias(c, i) for i, c in enumerate(p.projs[: p.n_keys])]
        aggs = [
            unalias(c, i + p.n_keys) for i, c in enumerate(p.projs[p.n_keys:])
        ]
        df = df.groupBy(*grp).agg(*aggs)
    else:
        df = df.selectExpr(*p.projs)
    df = df.orderBy(*[F.col(f"c{i}").asc_nulls_first() for i in range(len(p.projs))])
    if p.limit is not None:
        df = df.limit(p.limit)
    return df
