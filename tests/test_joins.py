"""Temporal join operators (stages/joins.py): DuckDB parity, deterministic
tie handling, partition-count invariance, empty sides."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raydedup.stages.joins import asof_join, range_join_agg

WIDTH = 10**10


def _corpus(seed=7, n=4000, users=50, tie_every=0):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 10**9, n) * 1000
    if tie_every:
        # force (user, ts) collisions on the right side
        ts[::tie_every] = ts[1::tie_every][: len(ts[::tie_every])]
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, users, n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["a", "b"], n)),
        "value": pa.array(rng.random(n) * 50, pa.float64()),
    })


def _sides(ev):
    base = ray.data.from_arrow(ev)

    def pick(v):
        return lambda t: t.filter(pc.equal(t.column("event_type"), v)) \
            .drop_columns(["event_type"])

    return (base.map_batches(pick("a"), batch_format="pyarrow"),
            base.map_batches(pick("b"), batch_format="pyarrow"))


def _asof_oracle(ev):
    con = duckdb.connect()
    con.register("ev", ev)
    return con.sql("""
        WITH r0 AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
          FROM ev WHERE event_type='b'
          QUALIFY row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                     ORDER BY event_id DESC) = 1
        ), l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                 FROM ev WHERE event_type='a')
        SELECT l.event_id AS event_id, l.user_id AS key, l.ts_us AS ts_us,
               COALESCE(r0.event_id, -1) AS matched_event_id,
               COALESCE(r0.ts_us, -1) AS matched_ts_us,
               COALESCE(r0.value, -1.0) AS matched_value
        FROM l ASOF LEFT JOIN r0
          ON l.user_id = r0.user_id AND l.ts_us >= r0.ts_us
        ORDER BY event_id
    """).df()


def _range_oracle(ev):
    con = duckdb.connect()
    con.register("ev", ev)
    return con.sql(f"""
        WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                   FROM ev WHERE event_type='a'),
        r AS (SELECT user_id, epoch_us(ts) AS ts_us,
                     CAST(floor(value*100) AS BIGINT) AS cents
              FROM ev WHERE event_type='b')
        SELECT l.event_id AS event_id, l.user_id AS key, l.ts_us AS ts_us,
               count(r.ts_us) AS n_in_window,
               COALESCE(sum(r.cents), 0) AS sum_scaled
        FROM l LEFT JOIN r ON l.user_id = r.user_id
             AND r.ts_us <= l.ts_us AND r.ts_us > l.ts_us - {WIDTH}
        GROUP BY 1, 2, 3 ORDER BY event_id
    """).df()


def _run(ds):
    return ds.to_pandas().sort_values("event_id").reset_index(drop=True)


def test_asof_join_matches_duckdb(ray_session):
    ev = _corpus()
    left, right = _sides(ev)
    out = _run(asof_join(left, right, num_parts=5))
    ora = _asof_oracle(ev)
    assert (out.matched_event_id >= 0).sum() > len(out) * 0.9
    pd.testing.assert_frame_equal(out[ora.columns], ora, check_dtype=False)


def test_asof_join_tie_rule_and_partition_invariance(ray_session):
    ev = _corpus(seed=11, n=2000, users=8, tie_every=3)
    left, right = _sides(ev)
    ora = _asof_oracle(ev)
    for parts in (1, 7):
        out = _run(asof_join(left, right, num_parts=parts))
        pd.testing.assert_frame_equal(out[ora.columns], ora,
                                      check_dtype=False)


def test_range_join_agg_matches_duckdb(ray_session):
    ev = _corpus(seed=13)
    left, right = _sides(ev)
    ora = _range_oracle(ev)
    for parts in (1, 6):
        out = _run(range_join_agg(left, right, width_us=WIDTH,
                                  num_parts=parts))
        assert out.n_in_window.sum() > 0
        pd.testing.assert_frame_equal(out[ora.columns], ora,
                                      check_dtype=False)


def test_joins_empty_right_side(ray_session):
    ev = _corpus(seed=17, n=500)
    left, _ = _sides(ev)
    empty = ray.data.from_arrow(ev.slice(0, 0))
    o1 = _run(asof_join(left, empty, num_parts=3))
    assert len(o1) == left.count()
    assert (o1.matched_event_id == -1).all()
    assert (o1.matched_value == -1.0).all()
    o2 = _run(range_join_agg(left, empty, width_us=WIDTH, num_parts=3))
    assert (o2.n_in_window == 0).all() and (o2.sum_scaled == 0).all()


def test_range_window_boundaries_exact(ray_session):
    # right events exactly at t (included) and exactly at t-W (excluded)
    t0 = 5_000_000_000_000
    ev = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([t0, t0, t0 - WIDTH, t0 - WIDTH + 1],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "b", "b"]),
        "value": pa.array([0.0, 10.0, 20.0, 30.0], pa.float64()),
    })
    left, right = _sides(ev)
    out = _run(range_join_agg(left, right, width_us=WIDTH, num_parts=2))
    assert len(out) == 1
    assert int(out.n_in_window[0]) == 2        # at t and t-W+1; not t-W
    assert int(out.sum_scaled[0]) == 1000 + 3000
