"""Every registered SQL-expressible query must hash-match its DuckDB oracle
at sf0.001 (fast) — the local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from kafka_workers_spark.queries import load_all
from tests.oracle import compare_query

REGISTRY = load_all()
SQL_CHECKED = [s for s in REGISTRY.values() if s.oracle is not None]


def test_query_matches_oracle(spark, sf_dir):
    """Every driver-windowed query against its DuckDB oracle — the local
    mirror of the driver's CORRECTNESS gate. All 50 rows run concurrently
    on 6 threads (Spark jobs and per-thread DuckDB connections are both
    thread-safe — the pattern the rotated-out oracle test proved; the
    serial parametrized form paid per-query Spark job latency 50× and
    cost ~75s of suite wall); the failure message still names every
    failing query with its assertion."""
    from concurrent.futures import ThreadPoolExecutor

    def run(spec):
        try:
            compare_query(spark, sf_dir, spec)
            return None
        except Exception as exc:  # noqa: BLE001 — reported per query below
            return f"{spec.name}: {str(exc)[:300]}"

    with ThreadPoolExecutor(max_workers=6) as pool:
        failures = [f for f in pool.map(run, SQL_CHECKED) if f]
    assert not failures, "\n".join(failures)


def test_registry_fits_driver_window():
    """The driver's correctness harness checks only the first
    DRIVER_QUERY_WINDOW registrations (CORRECTNESS_r02 proved exactly 50).
    With the round-5 EXTRA_REGISTRY overflow in place the invariant is
    EXACT fullness: fewer than 50 wastes driver rows (rotate an
    off-window query in), more than 50 silently unchecks the tail
    (rotate one out)."""
    from kafka_workers_spark.queries import DRIVER_QUERY_WINDOW

    assert len(REGISTRY) == DRIVER_QUERY_WINDOW, (
        f"registry has {len(REGISTRY)} windowed queries; the driver checks "
        f"exactly the first {DRIVER_QUERY_WINDOW} — rotate with "
        "register(..., windowed=False) to keep the window exactly full"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql().keys()) <= set(e.queries().keys())


def test_exact_dedup_operator(spark):
    """operators.dedup.exact_dedup keeps one row (min id) per content."""
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "cc"), (5, "bb"), (6, "aa")],
        "id long, body string",
    )
    out = exact_dedup(df, content_col="body", id_col="id").collect()
    assert sorted((r.id, r.body) for r in out) == [(1, "aa"), (2, "bb"), (4, "cc")]


def test_salted_join_matches_plain_join(spark):
    """operators.relational.salted_join: row-identical to the unsalted
    join on a skewed input (one key = 90% of rows), inner and left."""
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.relational import salted_join

    left = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (3, "cold"), (999, "unmatched")], "k long, tag string"
    )
    for how in ("inner", "left"):
        plain = left.join(right, "k", how).groupBy("k", "tag").count()
        salted = salted_join(left, right, "k", how, salt=8).groupBy("k", "tag").count()
        p = {tuple(r) for r in plain.collect()}
        s = {tuple(r) for r in salted.collect()}
        assert s == p, f"{how}: salted != plain"


def test_minhash_lsh_scales_to_production_parameters(spark):
    """The MinHash/LSH operators are parameterized, not fixed to the
    registered query's oracle-sized (k=8, 4×2) configuration: at k=16 with
    8×2 bands, exact duplicates still always collide in every band (the
    LSH completeness invariant), and near-identical docs collide in at
    least one."""
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.dedup import lsh_bands, minhash_agg
    from kafka_workers_spark.operators.text import shingle_stage, tokenize_stage

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact duplicate of 1
            (3, base + " lambda"),  # near-duplicate (1 extra token)
            (4, "completely different words nothing shared here at all ok"),
        ],
        "doc_id long, text string",
    )
    staged = shingle_stage(tokenize_stage(docs), 3, distinct=True)
    k, n_bands, rows = 16, 8, 2
    sigs = minhash_agg(staged, ["doc_id"], k=k)
    banded = sigs.select(
        "doc_id", F.explode(lsh_bands(F.col("sig"), n_bands, rows)).alias("bk")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("n_bands_hit"))
    )
    hits = {(r.da, r.db): r.n_bands_hit for r in pairs.collect()}
    assert hits.get((1, 2)) == n_bands  # exact dup: every band collides
    assert (1, 3) in hits or (2, 3) in hits  # near-dup: some band collides
    assert not any(4 in p for p in hits)  # unrelated doc: no collisions


def test_lsh_band_keys_null_for_shingleless_docs(spark):
    """A document too short to shingle has an all-NULL signature, and its
    band keys must be NULL so the candidate join DROPS it — the SQL
    oracle's ``||`` semantics. The earlier concat_ws form skipped NULLs
    and keyed every such doc into one shared md5('<band>') bucket: an
    O(n²) hot bucket and a wrong every-empty-doc-pairs-with-every-other
    answer the oracle contradicts (found in review of the
    dedup_group_components driver row; pre-existing in
    dedup_minhash_lsh)."""
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.dedup import lsh_bands, minhash_agg
    from kafka_workers_spark.operators.text import shingle_stage, tokenize_stage

    docs = spark.createDataFrame(
        [(1, "only two"), (2, "one"), (3, ""), (4, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    staged = shingle_stage(tokenize_stage(docs), 3, distinct=True)
    banded = minhash_agg(staged, ["doc_id"], k=8).select(
        "doc_id", F.explode(lsh_bands(F.col("sig"), 4, 2)).alias("bk")
    )
    keys = {
        (r.doc_id, r.bk.band): r.bk.band_key for r in banded.collect()
    }
    # docs 1-3 cannot form a 3-shingle: every band key NULL
    assert all(keys[(d, b)] is None for d in (1, 2, 3) for b in range(4))
    assert all(keys[(4, b)] is not None for b in range(4))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bk.band") == F.col("b.bk.band"))
        & (F.col("a.bk.band_key") == F.col("b.bk.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    assert pairs.count() == 0


def test_chunk_documents_overlapping_windows(spark):
    """operators.text.chunk_documents: full coverage, correct overlap,
    bounded chunk sizes, passthrough columns."""
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.text import chunk_documents

    words = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en"), (2, "short doc", "de")],
        "doc_id long, text string, lang string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=2).orderBy("doc_id", "chunk_id")
    rows = out.collect()

    d1 = [(r.chunk_id, r.chunk_text) for r in rows if r.doc_id == 1]
    # step = 2: starts 0,2,4,6 -> 4 chunks. A start of 8 would yield
    # "w8 w9" — a pure suffix of the chunk at 6 (duplicated text), so the
    # sequence is capped at n - 1 - overlap = 7.
    assert d1 == [
        (0, "w0 w1 w2 w3"),
        (1, "w2 w3 w4 w5"),
        (2, "w4 w5 w6 w7"),
        (3, "w6 w7 w8 w9"),
    ]
    # consecutive chunks share exactly `overlap` tokens
    for (_, a), (_, b) in zip(d1, d1[1:]):
        assert a.split()[-2:] == b.split()[:2]
    d2 = [(r.chunk_id, r.chunk_text, r.lang) for r in rows if r.doc_id == 2]
    assert d2 == [(0, "short doc", "de")]  # shorter than one chunk -> itself
    assert all(1 <= r.chunk_n_tokens <= 4 for r in rows)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_property_vs_model(spark):
    """Randomized geometries and lengths vs a pure Python reference
    model — full token coverage, exact overlap arithmetic, no
    pure-suffix tail chunk. Batched: one Spark round-trip per geometry
    (lengths vary within a call), seeded RNG for reproducibility."""
    import random as _random

    from kafka_workers_spark.operators.text import chunk_documents

    def model(words, chunk_tokens, overlap):
        step = chunk_tokens - overlap
        stop = max(len(words) - 1 - overlap, 0)
        out, s = [], 0
        while s <= stop:
            piece = words[s : s + chunk_tokens]
            out.append((s // step, " ".join(piece), len(piece)))
            s += step
        return out

    r = _random.Random(7)
    for _ in range(6):
        ct = r.randint(2, 12)
        ov = r.randint(0, ct - 1)
        lengths = [r.randint(0, 40) for _ in range(6)]
        rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(lengths)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r2 in chunk_documents(docs, chunk_tokens=ct, overlap=ov).collect():
            got.setdefault(r2.doc_id, []).append(
                (r2.chunk_id, r2.chunk_text, r2.chunk_n_tokens)
            )
        for i, n in enumerate(lengths):
            # split(" ") of an empty string yields [""] — one empty
            # token; mirror the engine's tokenizer in the model
            words = [f"t{j}" for j in range(n)] if n else [""]
            want = model(words, ct, ov)
            assert sorted(got.get(i, [])) == sorted(want), (ct, ov, n)


def test_asof_join_directions_match_pandas_merge_asof(spark):
    """backward / forward / nearest cross-checked against pandas
    merge_asof on randomized-but-fixed data, including equal-timestamp
    ties (allow_exact_matches semantics) and keys with no match."""
    import numpy as np
    import pandas as pd

    from kafka_workers_spark.operators.relational import asof_join

    rng = np.random.RandomState(5)
    left_rows = [(int(k), int(t)) for k in range(4) for t in sorted(rng.randint(0, 100, 6))]
    right_rows = [(int(k), int(t)) for k in range(3) for t in sorted(rng.randint(0, 100, 4))]
    right_rows.append((0, left_rows[0][1]))  # planted exact tie
    left = spark.createDataFrame(left_rows, "k long, lts long")
    right = spark.createDataFrame(right_rows, "k long, rts long")

    lpd = pd.DataFrame(left_rows, columns=["k", "lts"]).sort_values("lts", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "rts"]).sort_values("rts", kind="stable")

    for direction in ("backward", "forward", "nearest"):
        got = {
            (r.k, r.lts): r.asof_ts
            for r in asof_join(
                left, right, "k", "lts", "rts", how="left", direction=direction
            ).collect()
        }
        want_df = pd.merge_asof(
            lpd, rpd, left_on="lts", right_on="rts", by="k", direction=direction
        )
        want = {
            (r.k, r.lts): (None if pd.isna(r.rts) else int(r.rts))
            for r in want_df.itertuples()
        }
        assert got == want, (direction, {x: (got[x], want[x]) for x in got if got[x] != want[x]})


def test_asof_join_forward_tolerance(spark):
    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 10), (1, 50)], "k long, lts long")
    right = spark.createDataFrame([(1, 12), (1, 90)], "k long, rts long")
    out = {
        r.lts: r.asof_ts
        for r in asof_join(
            left, right, "k", "lts", "rts", how="left",
            direction="forward", tolerance=F.lit(5),
        ).collect()
    }
    assert out == {10: 12, 50: None}  # 90 is 40 ahead of 50: outside tolerance

    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "lts", "rts", direction="sideways")


def test_asof_nearest_shares_one_exchange(spark):
    """The docstring's scale claim: backward+forward windows ride ONE key
    shuffle (same partitioning, two sorts) — nearest must not double the
    exchange count of backward."""
    from kafka_workers_spark.operators.relational import asof_join
    from kafka_workers_spark.plans import audit

    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    right = spark.createDataFrame([(1, 12)], "k long, rts long")
    back = audit(asof_join(left, right, "k", "lts", "rts", direction="backward"))
    near = audit(asof_join(left, right, "k", "lts", "rts", direction="nearest"))
    assert near.exchanges == back.exchanges, (near.exchanges, back.exchanges)


def test_funnel_steps_partial_depths_and_strict_order(spark):
    """Depth arms the dense testdata can't reach: user stuck at stage 1,
    stage 2, out-of-order events never count, equal timestamps don't
    advance (strict >), greedy picks the earliest chain."""
    from datetime import datetime

    from kafka_workers_spark.operators.relational import funnel_steps

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1: full funnel, greedy earliest (two views; first one counts)
        (1, t(0), "view"), (1, t(5), "view"), (1, t(10), "click"), (1, t(20), "purchase"),
        # u2: click BEFORE view -> stuck at depth 1
        (2, t(10), "click"), (2, t(20), "view"),
        # u3: view+click same second -> click does NOT advance; later click does
        (3, t(0), "view"), (3, t(0), "click"), (3, t(9), "click"),
        # u4: never views -> absent from output
        (4, t(0), "click"), (4, t(1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.user_id: r for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].depth, out[1].t_1, out[1].t_2, out[1].t_3) == (3, t(0), t(10), t(20))
    assert (out[2].depth, out[2].t_2) == (1, None)
    assert (out[3].depth, out[3].t_2, out[3].t_3) == (2, t(9), None)
    import pytest as _pt

    with _pt.raises(ValueError, match="step_values"):
        funnel_steps(ev, [])


def test_sessionize_gap_boundaries(spark):
    """Gap exactly == threshold stays in-session (strict >); gap+1
    starts a new one; sessions number 0-based per user independently."""
    from datetime import datetime, timedelta

    from kafka_workers_spark.operators.relational import sessionize

    base = datetime(2024, 1, 1)
    rows = [
        (1, 1, base),
        (1, 2, base + timedelta(seconds=30)),        # gap 30 == thresh -> same
        (1, 3, base + timedelta(seconds=61)),        # gap 31 > thresh -> new
        (2, 4, base + timedelta(seconds=1000)),      # other user starts at 0
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = {r.event_id: r.session_id for r in sessionize(ev, gap_seconds=30).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}
    import pytest as _pt

    with _pt.raises(ValueError, match="gap_seconds"):
        sessionize(ev, gap_seconds=0)


def test_funnel_within_window_bounds_chain(spark):
    """Stages past t_1 + within don't count; exactly-at-boundary counts
    (<=); the unwindowed call is unchanged."""
    from datetime import datetime, timedelta

    from kafka_workers_spark.operators.relational import funnel_steps

    t = lambda s: datetime(2024, 1, 1) + timedelta(seconds=s)  # noqa: E731
    rows = [
        (1, t(0), "view"), (1, t(50), "click"), (1, t(200), "purchase"),
        (2, t(0), "view"), (2, t(100), "click"),   # boundary: exactly within
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.user_id: r.depth
        for r in funnel_steps(
            ev, ["view", "click", "purchase"], within_seconds=100
        ).collect()
    }
    assert out == {1: 2, 2: 2}  # u1's purchase at +200 falls outside
    full = {r.user_id: r.depth for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert full == {1: 3, 2: 2}
    import pytest as _pt

    with _pt.raises(ValueError, match="within_seconds"):
        funnel_steps(ev, ["view"], within_seconds=0)


def test_gap_fill_zero_fills_and_bounds(spark):
    """Every bucket between a key's first and last event appears; silent
    buckets carry n_rows 0 and NULL custom aggregates; keys never leak
    outside their own span."""
    from datetime import datetime, timedelta

    from kafka_workers_spark.functions.determinism import dsum
    from kafka_workers_spark.operators.relational import gap_fill

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.0), (1, t0 + timedelta(hours=3), 2.0),  # gap: hours 1, 2
        (2, t0 + timedelta(hours=10), 5.0),               # single bucket
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    out = gap_fill(df, ["k"], "ts", 3600, aggs=[dsum("value", "sum_value")])
    got = {(r.k, r.bucket_start): (r.n_rows, r.sum_value) for r in out.collect()}
    assert len(got) == 5
    assert got[(1, t0)] == (1, 1.0)
    assert got[(1, t0 + timedelta(hours=1))] == (0, None)
    assert got[(1, t0 + timedelta(hours=2))] == (0, None)
    assert got[(1, t0 + timedelta(hours=3))] == (1, 2.0)
    assert got[(2, t0 + timedelta(hours=10))] == (1, 5.0)
    # pre-epoch timestamps bucket by FLOOR division: 23:30 on 1969-12-31
    # belongs to the 23:00 pre-epoch bucket, never to bucket 0 (a
    # truncating DIV would put bucket_start AFTER the event)
    pre = datetime(1969, 12, 31, 23, 30)
    out2 = gap_fill(
        spark.createDataFrame([(9, pre, 1.0)], "k long, ts timestamp, value double"),
        ["k"], "ts", 3600,
    ).collect()
    assert len(out2) == 1 and out2[0].bucket_start == datetime(1969, 12, 31, 23, 0)
    import pytest as _pt

    with _pt.raises(ValueError, match="bucket_seconds"):
        gap_fill(df, ["k"], "ts", 0)


def test_profile_table_counts_nulls_and_typed_minmax(spark):
    from kafka_workers_spark.operators.relational import profile_table

    df = spark.createDataFrame(
        [(1, "b", 10.5), (2, None, 2.25), (2, "a", None)],
        "id long, s string, d double",
    )
    out = {
        r.column: r
        for r in profile_table(
            df.withColumn("d", df["d"].cast("decimal(10,2)")), ["id", "s", "d"]
        ).collect()
    }
    assert out["id"].n_rows == 3 and out["id"].n_nonnull == 3 and out["id"].n_distinct == 2
    assert out["s"].n_nonnull == 2 and out["s"].n_distinct == 2
    assert (out["s"].min_value, out["s"].max_value) == ("a", "b")
    # typed min/max: numeric order (2.25 < 10.50), not lexicographic
    assert (out["d"].min_value, out["d"].max_value) == ("2.25", "10.50")
    import pytest as _pt

    with _pt.raises(ValueError, match="cols"):
        profile_table(df, [])


def test_interval_overlap_join_banded_equals_naive(spark):
    """Banded canonical-bucket plan == the direct overlap predicate on a
    randomized interval set (pairs exactly once, including intervals
    spanning many buckets, touching endpoints, and zero-length
    intervals); invalid intervals drop; bad bucket raises."""
    import random
    from datetime import datetime, timedelta

    from kafka_workers_spark.operators.relational import interval_overlap_join
    from pyspark.sql import functions as F

    rng = random.Random(9)
    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(120):
        s = rng.randrange(0, 5000)
        ln = rng.choice([0, 1, 5, 50, 400, 2500])  # zero-length to many-bucket
        rows.append((i, t0 + timedelta(minutes=s), t0 + timedelta(minutes=s + ln)))
    rows.append((900, t0, t0 - timedelta(minutes=1)))  # invalid: dropped
    df = spark.createDataFrame(rows, "iid long, s timestamp, e timestamp")
    a = df.select(F.col("iid").alias("id_a"), F.col("s").alias("s_a"), F.col("e").alias("e_a"))
    b = df.select(F.col("iid").alias("id_b"), F.col("s").alias("s_b"), F.col("e").alias("e_b"))
    got = sorted(
        (r.id_a, r.id_b)
        for r in interval_overlap_join(
            a, b, "s_a", "e_a", "s_b", "e_b", 600,  # 10-min buckets
            extra_cond=F.col("id_a") < F.col("id_b"),
        ).collect()
    )
    naive = sorted(
        (x[0], y[0])
        for x in rows for y in rows
        if x[0] < y[0] and x[2] >= x[1] and y[2] >= y[1]
        and x[1] <= y[2] and y[1] <= x[2]
    )
    assert got == naive and len(got) > 100
    assert not any(900 in p for p in got)
    import pytest as _pt

    with _pt.raises(ValueError, match="bucket_seconds"):
        interval_overlap_join(a, b, "s_a", "e_a", "s_b", "e_b", 0)


def test_group_ols_recovers_known_line_and_degenerates_safely(spark):
    """y = 3x + 2 exactly -> slope9 = 3e9, intercept 2.0; zero x
    variance -> NULL slope/intercept; a noisy group matches the numpy
    closed form to fixed-point resolution."""
    import numpy as np

    from kafka_workers_spark.operators.relational import group_ols

    rows = [("line", float(x), 3.0 * x + 2.0) for x in range(1, 21)]
    rows += [("flat", 5.0, float(y)) for y in range(10)]  # zero x variance
    rng = np.random.RandomState(3)
    xs = rng.uniform(0, 50, 200)
    ys = 1.7 * xs - 4.0 + rng.normal(0, 2.0, 200)
    rows += [("noisy", float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in group_ols(df, ["g"], "x", "y").collect()}
    assert out["line"].slope9 == 3_000_000_000 and abs(out["line"].intercept - 2.0) < 1e-6
    assert out["flat"].slope9 is None and out["flat"].intercept is None
    # numpy closed form on the SAME fixed-point values
    fx = np.floor(xs * 100).astype(np.int64)
    fy = np.floor(ys * 100).astype(np.int64)
    n = len(fx)
    num = n * int((fx * fy).sum()) - int(fx.sum()) * int(fy.sum())
    den = n * int((fx * fx).sum()) - int(fx.sum()) ** 2
    want_slope9 = int(num * 1_000_000_000) // den if num >= 0 else -((-num * 1_000_000_000) // den)
    assert out["noisy"].slope9 == want_slope9
    assert abs(out["noisy"].slope - 1.7) < 0.1


def test_mad_outliers_flags_planted_spikes(spark):
    """Known distribution: 20 values clustered at 100±2 plus two planted
    spikes — median/MAD land on cluster values and exactly the spikes
    flag; zero-MAD degenerate group flags every differing row."""
    from kafka_workers_spark.operators.relational import mad_outliers

    rows = [("g", i, 100.0 + (i % 5) - 2.0) for i in range(20)]
    rows += [("g", 100, 500.0), ("g", 101, -300.0)]
    rows += [("z", i, 7.0) for i in range(9)] + [("z", 99, 8.0)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    out = {r.k: r for r in mad_outliers(df, ["k"], "v", "id", k=3.0).collect()}
    g = out["g"]
    assert g.n == 22 and abs(g.median - 100.0) <= 2.0 and g.mad <= 2.0
    assert g.n_outliers == 2  # exactly the planted spikes
    z = out["z"]
    assert z.mad == 0.0 and z.n_outliers == 1  # the single 8.0 differs
    import pytest as _pt

    with _pt.raises(ValueError, match="k "):
        mad_outliers(df, ["k"], "v", "id", k=0)


def test_benford_profile_flags_uniform_data(spark):
    """A genuinely Benford-ish set (powers sweep) profiles near the
    expectation while uniform fabricated data deviates heavily on
    digit 1; zeros/NULLs excluded; sub-1 values use the first
    SIGNIFICANT digit."""
    from kafka_workers_spark.operators.relational import (
        BENFORD_PPM,
        benford_profile,
    )

    organic = [(float(1.37 ** i),) for i in range(1, 120)]  # log-uniform-ish
    out = {r.digit: r for r in benford_profile(
        spark.createDataFrame(organic, "v double"), "v").collect()}
    n = sum(r.observed for r in out.values())
    dev1 = out[1].deviation_ppm_n / (1_000_000 * n)
    assert dev1 < 0.08, f"organic digit-1 deviation {dev1}"
    uniform = [(float(100 + i),) for i in range(900)]  # digits 1-9 uniform
    outu = {r.digit: r for r in benford_profile(
        spark.createDataFrame(uniform, "v double"), "v").collect()}
    devu = outu[1].deviation_ppm_n / (1_000_000 * 900)
    assert devu > 0.15, f"uniform digit-1 deviation {devu}"
    assert outu[1].expected_ppm == BENFORD_PPM[1]
    edge = spark.createDataFrame(
        [(0.025,), (0.0,), (None,), (-20.0,),
         (float("nan"),), (float("inf"),), (float("-inf"),)],
        "v double",
    )
    edge_rows = benford_profile(edge, "v").collect()
    oute = {r.digit: r.observed for r in edge_rows}
    # full 1..9 grid always present (zero-count digits report observed=0,
    # ADVICE r09); 0.025 -> 2, -20 -> 2; zero/NULL/NaN/Inf all dropped
    assert oute == {d: (2 if d == 2 else 0) for d in range(1, 10)}
    zero_dev = {r.digit: r.deviation_ppm_n for r in edge_rows}
    assert zero_dev[1] == BENFORD_PPM[1] * 2  # missing digit carries full deviation
    assert all(r.n == 2 for r in edge_rows)  # n surfaced (ADVICE r10)
    # empty input: 9 rows, every deviation 0 BUT n=0 says "no evidence,
    # not conformance" — the distinguishing signal ADVICE r10 asked for
    empty_rows = benford_profile(edge.filter("v > 1e18"), "v").collect()
    assert len(empty_rows) == 9
    assert all(r.n == 0 and r.deviation_ppm_n == 0 and r.observed == 0
               for r in empty_rows)


def test_markov_transitions_crafted_sequences(spark):
    """Transition pin on crafted journeys: two users a->b->a->c and
    a->b->b — counts, row totals and probabilities exact; the first
    event of each user contributes no transition; empty key/order lists
    raise."""
    import pytest
    from datetime import datetime, timedelta

    from kafka_workers_spark.operators.relational import markov_transitions

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0 + timedelta(seconds=s), i, e)
        for i, (s, e) in enumerate([(0, "a"), (1, "b"), (2, "a"), (3, "c")])
    ] + [
        (2, t0 + timedelta(seconds=s), 10 + i, e)
        for i, (s, e) in enumerate([(0, "a"), (1, "b"), (2, "b")])
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    got = {
        (r.prev_state, r.next_state): (r.n, r.n_from, r.prob)
        for r in markov_transitions(ev, ["user_id"], ["ts", "event_id"], "event_type").collect()
    }
    # user 1 contributes (a,b),(b,a),(a,c); user 2 contributes (a,b),(b,b)
    assert got == {
        ("a", "b"): (2, 3, 2.0 / 3.0),
        ("a", "c"): (1, 3, 1.0 / 3.0),
        ("b", "a"): (1, 2, 0.5),
        ("b", "b"): (1, 2, 0.5),
    }
    with pytest.raises(ValueError, match="non-empty"):
        markov_transitions(ev, [], ["ts"], "event_type")


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_iv_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),  # start second
        st.integers(min_value=0, max_value=90),   # length (0 => point interval)
    ),
    min_size=2,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(ivs=_iv_strategy, bucket=st.sampled_from([7, 30, 60]))
def test_interval_overlap_join_equals_naive_on_random_intervals(spark, ivs, bucket):
    """Hypothesis boundary sweep for the banded interval join: random
    closed intervals (including zero-length points and spans landing
    EXACTLY on bucket edges — the canonical-later-start-bucket rule's
    danger zone) at several bucket widths must reproduce the naive
    range-predicate join pair-for-pair, each pair exactly once. The
    registered oracle checks this cross-engine on real data; this sweeps
    the adversarial micro-cases."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from kafka_workers_spark.operators.relational import interval_overlap_join

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=s), t0 + timedelta(seconds=s + ln))
        for i, (s, ln) in enumerate(ivs)
    ]
    df = spark.createDataFrame(rows, "iid long, s timestamp, e timestamp")
    a = df.select(F.col("iid").alias("id_a"), F.col("s").alias("s_a"), F.col("e").alias("e_a"))
    b = df.select(F.col("iid").alias("id_b"), F.col("s").alias("s_b"), F.col("e").alias("e_b"))
    got = sorted(
        (r.id_a, r.id_b)
        for r in interval_overlap_join(
            a, b, "s_a", "e_a", "s_b", "e_b", bucket_seconds=bucket,
            extra_cond=F.col("id_a") < F.col("id_b"),
        ).collect()
    )
    want = sorted(
        (x, y)
        for x, (sx, lx) in enumerate(ivs)
        for y, (sy, ly) in enumerate(ivs)
        if x < y and sx <= sy + ly and sy <= sx + lx
    )
    assert got == want, f"bucket={bucket}: {got} != {want}"


def test_pit_enrich_expiry_gap_and_null_attrs(spark):
    """The containment semantics the oracle's JOIN form implies
    (review r12): a fact AFTER a closed final version gets NULL (expired
    entity); a fact inside a GAP between versions gets NULL; a version
    whose attribute is legitimately NULL stays NULL instead of
    resurrecting the previous version's value — and valid_since always
    comes from the SAME version as the attribute (the struct carry)."""
    from datetime import datetime

    from kafka_workers_spark.operators.relational import pit_enrich

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    dim = spark.createDataFrame(
        [
            (1, ts(10), ts(20), "A"),   # closed final version: expires at 20
            (2, ts(10), ts(20), "B1"),  # gap [20, 30)
            (2, ts(30), None, "B2"),
            (3, ts(10), ts(20), "C"),
            (3, ts(20), None, None),    # value -> NULL transition
        ],
        "user_id long, valid_from timestamp, valid_to timestamp, state string",
    )
    facts = spark.createDataFrame(
        [(1, 100, ts(25)),   # after expiry -> NULL
         (2, 200, ts(25)),   # inside the gap -> NULL
         (2, 201, ts(35)),   # in B2
         (3, 300, ts(25))],  # in the NULL-state version -> NULL, NOT 'C'
        "user_id long, fact_id long, fts timestamp",
    )
    out = {
        r.fact_id: (r.state, r.valid_since)
        for r in pit_enrich(
            facts, dim, key="user_id", fact_ts="fts", dim_ts="valid_from",
            attrs=["state"], dim_tiebreak="valid_to", dim_valid_to="valid_to",
        ).collect()
    }
    assert out[100] == (None, None)
    assert out[200] == (None, None)
    assert out[201] == ("B2", ts(30))
    assert out[300] == (None, ts(20))  # the NULL-state version IS in force
    # without dim_valid_to the same lookup is pure as-of (open versions)
    asof = {
        r.fact_id: (r.state, r.valid_since)
        for r in pit_enrich(
            facts, dim, key="user_id", fact_ts="fts", dim_ts="valid_from",
            attrs=["state"], dim_tiebreak="valid_to",
        ).collect()
    }
    assert asof[100] == ("A", ts(10)) and asof[200] == ("B1", ts(10))
    import pytest

    with pytest.raises(ValueError, match="dim_valid_to"):
        pit_enrich(
            facts, dim, "user_id", "fts", "valid_from", ["state"],
            dim_valid_to="nope",
        )


def test_pit_enrich_boundaries_and_validation(spark):
    """Point-in-time lookup semantics (operators.relational.pit_enrich):
    a fact AT a version's valid_from sees that version (half-open
    interval, dim-first tie order); a fact before every version gets
    NULL; zero-width versions (two changes at one timestamp) resolve to
    the one whose interval extends (valid_to tiebreak, ascending nulls
    last); shared non-key columns are rejected."""
    from datetime import datetime

    import pytest

    from kafka_workers_spark.operators.relational import pit_enrich

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    dim = spark.createDataFrame(
        [
            # user 1: A from 10 (zero-width A' at 20 superseded by B at 20)
            (1, ts(10), ts(20), "A"),
            (1, ts(20), ts(20), "A2"),   # zero-width version [20, 20)
            (1, ts(20), None, "B"),
        ],
        "user_id long, valid_from timestamp, valid_to timestamp, state string",
    )
    facts = spark.createDataFrame(
        [(1, 100, ts(5)), (1, 101, ts(10)), (1, 102, ts(20)), (1, 103, ts(25)),
         (2, 200, ts(30))],
        "user_id long, fact_id long, fts timestamp",
    )
    out = {
        r.fact_id: (r.state, r.valid_since)
        for r in pit_enrich(
            facts, dim, key="user_id", fact_ts="fts", dim_ts="valid_from",
            attrs=["state"], dim_tiebreak="valid_to",
        ).collect()
    }
    assert out[100] == (None, None)          # before the first version
    assert out[101] == ("A", ts(10))         # AT valid_from -> visible
    assert out[102] == ("B", ts(20))         # zero-width A2 skipped
    assert out[103] == ("B", ts(20))
    assert out[200] == (None, None)          # user with no dim at all
    clash = facts.withColumnRenamed("fts", "valid_from")
    with pytest.raises(ValueError, match="share non-key"):
        pit_enrich(clash, dim, "user_id", "valid_from", "valid_from", ["state"])
    with pytest.raises(ValueError, match="not in dim"):
        pit_enrich(facts, dim, "user_id", "fts", "valid_from", ["nope"])
    # ADVICE r12 #5: the plan synthesizes valid_since + __-internals —
    # an input column with one of those names would duplicate/shadow an
    # output column, so both sides reject up front
    with pytest.raises(ValueError, match="valid_since"):
        pit_enrich(
            facts.withColumn("valid_since", facts.fts),
            dim, "user_id", "fts", "valid_from", ["state"],
        )
    with pytest.raises(ValueError, match="reserved"):
        pit_enrich(
            facts.withColumn("__ver", facts.fact_id),
            dim, "user_id", "fts", "valid_from", ["state"],
        )
    with pytest.raises(ValueError, match="reserved"):
        pit_enrich(
            facts, dim.withColumn("__t", dim.user_id),
            "user_id", "fts", "valid_from", ["state"],
        )
    with pytest.raises(ValueError, match="valid_since"):
        pit_enrich(
            facts, dim.withColumnRenamed("state", "valid_since"),
            "user_id", "fts", "valid_from", ["valid_since"],
        )


def test_markov_stationary_matches_integer_replay(spark):
    """The scaled-integer power iteration vs a literal Python replay on a
    chain with known stationary mix (A: .75 self-loop, .25 -> B; B -> A
    always => pi = (0.8, 0.2)), plus the dangling-state mass leak and
    the iters guard."""
    import pytest

    from kafka_workers_spark.operators.relational import (
        MARKOV_SCALE,
        markov_stationary,
    )

    trans = [("A", "A")] * 3 + [("A", "B")] + [("B", "A")] * 2
    df = spark.createDataFrame(trans, "prev_state string, next_state string")
    got = {r.state: r.pi9 for r in markov_stationary(df, iters=4).collect()}

    # literal replay of the documented recurrence
    s = MARKOV_SCALE
    q = {("A", "A"): (3 * s) // 4, ("A", "B"): (1 * s) // 4, ("B", "A"): (2 * s) // 2}
    pi = {"A": s // 2, "B": s // 2}
    for _ in range(4):
        nxt = {"A": 0, "B": 0}
        for (p, x), q9 in q.items():
            nxt[x] += (pi[p] * q9) // s
        pi = nxt
    assert got == pi
    assert abs(got["A"] - 0.8 * s) < 0.01 * s  # converging on (0.8, 0.2)

    # dangling terminal state: B absorbs then leaks (pagerank's documented
    # behavior) — mass shrinks, never crashes
    leak = spark.createDataFrame([("A", "B")], "prev_state string, next_state string")
    got = {r.state: r.pi9 for r in markov_stationary(leak, iters=2).collect()}
    assert got == {"A": 0, "B": 0}  # A's mass moved to B, then leaked
    with pytest.raises(ValueError, match="iters"):
        markov_stationary(df, iters=0)
