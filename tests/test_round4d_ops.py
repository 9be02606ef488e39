"""Round-4d operator tests: Bayer demosaic, OD matrix, convoy detection,
EWMA crossover — independent python/numpy replays."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etf_topox_spark.registry import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


def test_bayer_demosaic_matches_numpy_replay(spark):
    from etf_topox_spark.operators.image_demosaic import N_DM_IMGS
    from etf_topox_spark.sources.images import image_meta, image_pixels

    out = QUERIES["image_bayer_demosaic"](spark, SF).toPandas()
    acc: dict[tuple[int, int], list[int]] = {}
    for i in range(N_DM_IMGS):
        w, h, _, _ = image_meta(i)
        g = image_pixels(i, w, h)[:, :, 1].astype(np.int64)
        lap = np.abs(
            g[1:-1, :-2] + g[1:-1, 2:] + g[:-2, 1:-1] + g[2:, 1:-1]
            - 4 * g[1:-1, 1:-1]
        )
        yy, xx = np.mgrid[1:h - 1, 1:w - 1]
        for color, mask in ((0, (yy % 2 == 0) & (xx % 2 == 0)),
                            (2, (yy % 2 == 1) & (xx % 2 == 1))):
            e = lap[mask]
            a = acc.setdefault((i % 3, color), [0, 0, 0])
            a[0] += e.size
            a[1] += int(e.sum())
            a[2] = max(a[2], int(e.max()))
    assert len(out) == len(acc)
    for r in out.itertuples(index=False):
        assert acc[(r.size_class, r.site_color)] == [r.n_sites, r.sum_err, r.max_err]


def _stay_coords():
    from etf_topox_spark.operators.trajectory_stay import KX, KY, N_OBJECTS, N_TRAJ

    i = np.arange(N_TRAJ, dtype=np.int64)
    obj, t = i % N_OBJECTS, i // N_OBJECTS
    ax = ((obj * 131 + (t // 50) * 517) % 20000).astype(np.float64) / 1000
    ay = ((obj * 277 + (t // 50) * 839) % 20000).astype(np.float64) / 1000
    dwell = (t // 25) % 2 == 0
    x = np.where(dwell, ax + ((i * KX) % 800).astype(np.float64) / 1e6,
                 ((i * KX) % 20000).astype(np.float64) / 1000)
    y = np.where(dwell, ay + ((i * KY) % 800).astype(np.float64) / 1e6,
                 ((i * KY) % 20000).astype(np.float64) / 1000)
    return obj, t, x, y


def test_od_matrix_matches_pandas_replay(spark):
    from etf_topox_spark.operators.trajectory_mining import ZONE_DEG

    out = QUERIES["spatial_od_matrix"](spark, SF).toPandas()
    obj, t, x, y = _stay_coords()
    df = pd.DataFrame(
        {"obj": obj, "t": t,
         "zx": np.floor(x / ZONE_DEG).astype(np.int64),
         "zy": np.floor(y / ZONE_DEG).astype(np.int64)}
    ).sort_values(["obj", "t"])
    df["pzx"] = df.groupby("obj")["zx"].shift()
    df["pzy"] = df.groupby("obj")["zy"].shift()
    moved = df.dropna(subset=["pzx"]).query("zx != pzx or zy != pzy")
    rep = (
        moved.groupby(["pzx", "pzy", "zx", "zy"])
        .agg(n_flows=("obj", "size"), n_objects=("obj", "nunique"))
        .reset_index()
    )
    assert len(out) == len(rep)
    rep_keyed = {
        (int(r.pzx), int(r.pzy), int(r.zx), int(r.zy)): (r.n_flows, r.n_objects)
        for r in rep.itertuples(index=False)
    }
    for r in out.itertuples(index=False):
        assert rep_keyed[(r.from_zx, r.from_zy, r.to_zx, r.to_zy)] == (
            r.n_flows, r.n_objects
        )
    # flow mass conservation: total flows == total zone-change steps
    assert out["n_flows"].sum() == len(moved)


def test_convoy_detection_matches_bruteforce_replay(spark):
    from etf_topox_spark.operators.trajectory_mining import (
        CONVOY_D,
        CONVOY_K,
        CONVOY_OBJS,
        CONVOY_T,
    )

    out = QUERIES["spatial_convoy_detection"](spark, SF).toPandas()
    k = np.arange(CONVOY_OBJS * CONVOY_T, dtype=np.int64)
    obj, t = k % CONVOY_OBJS, k // CONVOY_OBJS
    gx = ((obj % 8) * 1723 + t * 37) % 20000
    gy = ((obj % 8) * 2417 + t * 53) % 20000
    div = ((t // 25) + obj) % 5 == 0
    x = np.where(div, (gx + ((obj * 77 + t * 991) % 9000 + 1000)) % 20000,
                 gx + (obj // 8) * 3)
    y = np.where(div, (gy + ((obj * 113 + t * 577) % 9000 + 1000)) % 20000,
                 gy + (obj // 8) * 3)
    X = np.zeros((CONVOY_T, CONVOY_OBJS), np.int64)
    Y = np.zeros_like(X)
    X[t, obj] = x
    Y[t, obj] = y
    episodes = []
    d2 = CONVOY_D * CONVOY_D
    for a in range(CONVOY_OBJS):
        for b in range(a + 1, CONVOY_OBJS):
            close = (X[:, a] - X[:, b]) ** 2 + (Y[:, a] - Y[:, b]) ** 2 <= d2
            run = 0
            for tt in range(CONVOY_T + 1):
                if tt < CONVOY_T and close[tt]:
                    run += 1
                else:
                    if run >= CONVOY_K:
                        episodes.append((a, b, tt - run, tt - 1, run))
                    run = 0
    rep = pd.DataFrame(
        episodes, columns=["obj_a", "obj_b", "start_t", "end_t", "n_ticks"]
    )
    got = out.sort_values(["obj_a", "obj_b", "start_t"]).reset_index(drop=True)
    rep = rep.sort_values(["obj_a", "obj_b", "start_t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), rep.astype("int64"))
    # formation members of the same group do convoy: at least one episode
    # for some same-group pair, and none spans a divergence window fully
    assert len(got) > 0


def test_ewma_crossover_matches_python_replay(spark):
    from etf_topox_spark.operators.events_ewma import FAST, SLOW

    out = QUERIES["events_ewma_crossover"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    # decimal(30,6) daily sums: round each value to 6 dp before summing
    days = (
        ev.assign(v=ev["value"].round(6))
        .groupby(["event_type", "d"])["v"].sum().reset_index()
    )
    for et, g in days.groupby("event_type"):
        vs = g.sort_values("d")["v"].to_list()
        fast = slow = vs[0]
        above, n_cross = False, 0
        for v in vs[1:]:
            fast = fast + (v - fast) * FAST
            slow = slow + (v - slow) * SLOW
            na = fast > slow
            n_cross += int(na != above)
            above = na
        row = out[out["event_type"] == et].iloc[0]
        assert row["n_days"] == len(vs)
        assert row["n_cross"] == n_cross
        # replay sums daily values in a (possibly) different order than the
        # decimal-exact engine; the recurrence contracts old errors, so the
        # final states agree to float tolerance while counts are exact
        assert np.isclose(row["final_fast"], fast, rtol=1e-9)
        assert np.isclose(row["final_slow"], slow, rtol=1e-9)
