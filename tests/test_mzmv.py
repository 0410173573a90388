"""read_mzmv tests over a synthetic fixture zip.

The reference ships no mzmv sample data or tests; the fixture below
exercises every documented behavior of trackintel read_mzmv
(io/dataset_reader.py:369-455): 24:00:00 clamping, cross-midnight
duration fixes, activity/trip linkage of derived staypoints, home/work
purpose tagging, and verification-point linestring assembly in
(S, R1..R6, Z) order.
"""

from __future__ import annotations

import os
import zipfile

import pytest

from trackintel_spark.sources.mzmv import read_mzmv

WEGE = """HHNR,WEGNR,f51100time,f51400time,pseudo
1,1,08:00:00,08:30:00,a
1,2,23:30:00,24:00:00,b
2,1,09:00:00,09:45:00,c
"""

# user 1: trip 1 has two etappen (walk+train), trip 2 one etappe that
# crosses midnight (finished 00:15 -> negative before the +1 day fix).
# user 2: one trip, one etappe; its start is user 2's home.
ETAPPEN = """HHNR,WEGNR,ETNR,f51100time,f51400time,f52900,S_X,S_Y,S_X_CH1903,S_Y_CH1903,Z_X,Z_Y,Z_X_CH1903,Z_Y_CH1903
1,1,1,08:00:00,08:10:00,2,8.50,47.40,100,200,8.51,47.41,110,210
1,1,2,08:12:00,08:30:00,3,8.51,47.41,110,210,8.55,47.45,150,250
1,2,3,23:30:00,00:15:00,11,8.55,47.45,150,250,8.50,47.40,100,200
2,1,1,09:00:00,09:45:00,2,9.00,46.90,300,400,9.10,46.95,310,410
"""

VP = """HHNR,ETNR,R1_X,R1_Y,R1_X_CH1903,R1_Y_CH1903,R2_X,R2_Y,R2_X_CH1903,R2_Y_CH1903,R3_X,R3_Y,R3_X_CH1903,R3_Y_CH1903,R4_X,R4_Y,R4_X_CH1903,R4_Y_CH1903,R5_X,R5_Y,R5_X_CH1903,R5_Y_CH1903,R6_X,R6_Y,R6_X_CH1903,R6_Y_CH1903
1,1,8.502,47.402,101,201,8.505,47.405,104,204,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997
1,2,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997
1,3,8.53,47.43,130,230,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997
2,1,9.05,46.92,305,405,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997
"""

# user 1 works at (150, 250) = end of trip 1; user 2's home is (300, 400)
ZIELPERSONEN = """HHNR,A_X_CH1903,A_Y_CH1903,AU_X_CH1903,AU_Y_CH1903,W_X_CH1903,W_Y_CH1903
1,150,250,-997,-997,100,200
2,-998,-998,-998,-998,300,400
"""

# W_* (home) coordinates also live on the etappen rows in real MZMV; the
# fixture replicates that by joining them in via a patched header below.


@pytest.fixture(scope="module")
def mzmv_zip(tmp_path_factory):
    root = tmp_path_factory.mktemp("mzmv")
    # real MZMV stores the home coords on etappen; extend the fixture rows
    lines = ETAPPEN.strip().split("\n")
    lines[0] += ",W_X_CH1903,W_Y_CH1903"
    homes = {"1": (100, 200), "2": (300, 400)}
    for i in range(1, len(lines)):
        hh = lines[i].split(",")[0]
        lines[i] += f",{homes[hh][0]},{homes[hh][1]}"
    etappen = "\n".join(lines) + "\n"

    zpath = os.path.join(root, "CH_CSV.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("wege.csv", WEGE)
        zf.writestr("etappen.csv", etappen)
        zf.writestr("verifikationspunkte.csv", VP)
        zf.writestr("zielpersonen.csv", ZIELPERSONEN)
    return zpath


@pytest.fixture(scope="module")
def mzmv(spark, mzmv_zip):
    trips, sp, tpls = read_mzmv(spark, mzmv_zip)
    return (
        sorted((r.asDict(recursive=True) for r in trips.collect()), key=lambda d: d["id"]),
        sorted(((r.user_id, r.ETNR, r.asDict(recursive=True)) for r in sp.collect()),
               key=lambda t: t[2]["id"]),
        sorted(((r.user_id, r.ETNR, r.asDict(recursive=True)) for r in tpls.collect()),
               key=lambda t: t[2]["id"]),
    )


def test_mzmv_times_and_midnight(mzmv):
    trips, sp, tpls = mzmv
    by_id = {t["id"]: t for t in trips}
    # 24:00:00 clamps to 23:59:59 on the same day
    assert by_id[1]["finished_at"].strftime("%H:%M:%S") == "23:59:59"
    assert by_id[1]["finished_at"].day == 1
    # cross-midnight etappe gets +1 day
    leg = [t for _, _, t in tpls if t["WEGNR"] == 2][0]
    assert leg["finished_at"].day == 2 and leg["started_at"].day == 1


def test_mzmv_staypoint_linkage(mzmv):
    trips, sp, tpls = mzmv
    u1 = [d for (u, _, d) in sp if u == 1]
    assert len(u1) == 4  # 3 leg starts + trailing
    acts = [d for d in u1 if d["is_activity"]]
    # the between-legs staypoint inside trip 1 is NOT an activity
    mid = [d for d in u1 if not d["is_activity"]]
    assert len(mid) == 1 and mid[0]["trip_id"] == 0
    assert mid[0]["prev_trip_id"] is None and mid[0]["next_trip_id"] is None
    # the staypoint between trip 1 and trip 2 links both
    between = [d for d in acts if d["prev_trip_id"] is not None and d["next_trip_id"] is not None]
    assert len(between) == 1
    assert between[0]["prev_trip_id"] == 0 and between[0]["next_trip_id"] == 1
    # zero-duration first staypoint
    first = [d for d in acts if d["next_trip_id"] == 0][0]
    assert first["started_at"] == first["finished_at"]
    # trailing staypoint: starts when the last leg ends, open-ended
    tail = [d for d in acts if d["prev_trip_id"] == 1][0]
    assert tail["finished_at"] is None and tail["started_at"].day == 2


def test_mzmv_trip_staypoint_ids_consistent(mzmv):
    trips, sp, tpls = mzmv
    sp_by_id = {d["id"]: d for (_, _, d) in sp}
    for t in trips:
        assert sp_by_id[t["origin_staypoint_id"]]["next_trip_id"] == t["id"]
        assert sp_by_id[t["destination_staypoint_id"]]["prev_trip_id"] == t["id"]


def test_mzmv_purpose(mzmv):
    trips, sp, tpls = mzmv
    # user 1 worked at CH1903 (150,250): trip-1 destination / trip-2 origin
    u1_work = [d for (u, _, d) in sp if u == 1 and d["purpose"] == "work"]
    assert len(u1_work) == 1 and d1_coords(u1_work[0]) == (150, 250)
    # user 1 home at (100,200): first staypoint and trailing staypoint
    u1_home = [d for (u, _, d) in sp if u == 1 and d["purpose"] == "home"]
    assert len(u1_home) == 2
    # user 2's leg starts at home
    u2_home = [d for (u, _, d) in sp if u == 2 and d["purpose"] == "home"]
    assert len(u2_home) == 1 and d1_coords(u2_home[0]) == (300, 400)


def d1_coords(d):
    return (d["X_CH1903"], d["Y_CH1903"])


def test_mzmv_purpose_tpls_shift(mzmv):
    trips, sp, tpls = mzmv
    # staypoint purpose_tpls = f52900 of the PRECEDING leg
    u1 = sorted((d["id"], d) for (u, _, d) in sp if u == 1)
    vals = [d["purpose_tpls"] for _, d in u1]
    assert vals == [None, 2, 3, 11]


def test_mzmv_vp_linestrings(mzmv):
    trips, sp, tpls = mzmv
    legs = {(u, e): d for (u, e, d) in tpls}
    # leg (1,1): S + R1 + R2 + Z = 4 vertices in order
    g = legs[(1, 1)]["geom"]
    assert [(p["lon"], p["lat"]) for p in g] == [
        (8.50, 47.40), (8.502, 47.402), (8.505, 47.405), (8.51, 47.41)
    ]
    # leg (1,2): no verification points -> S + Z only
    g2 = legs[(1, 2)]["geom"]
    assert len(g2) == 2 and g2[0]["lon"] == 8.51 and g2[-1]["lon"] == 8.55


def test_mzmv_routed_geometry(spark, mzmv_zip, tmp_path):
    """Survey-folder layout with a 5_Routen shapefile: routed linestrings
    left-join onto triplegs as `geometry` (reference :434-436), NULL for
    legs without a route and for invalid (<2 vertex) routes (:448)."""
    import shutil

    from _shp_writer import _point, _polyline, write_shapefile

    root = tmp_path / "survey"
    (root / "4_DB_csv").mkdir(parents=True)
    shutil.copy(mzmv_zip, root / "4_DB_csv" / "CH_CSV.zip")
    rdir = root / "5_Routen(Geometriefiles)"
    rdir.mkdir()
    base = str(tmp_path / "CH_routen")
    shapes = [
        _polyline([[(8.50, 47.40), (8.505, 47.404), (8.51, 47.41)]]),  # (1,1)
        _point(9.0, 46.9),  # (2,1): a degenerate "route" -> invalid -> NULL
        # (1,2): MULTI-part route -> parts flatten into one sequence
        _polyline([[(8.51, 47.41), (8.52, 47.42)], [(8.53, 47.43), (8.55, 47.45)]]),
    ]
    write_shapefile(base, shapes, 3,
                    [("HHNR", "N", 8, 0), ("ETNR", "N", 4, 0)],
                    [(1, 1), (2, 1), (1, 2)])
    with zipfile.ZipFile(rdir / "CH_routen.zip", "w") as zf:
        for ext in (".shp", ".shx", ".dbf"):
            zf.write(base + ext, "CH_routen" + ext)

    _, _, tpls = read_mzmv(spark, str(root))
    legs = {(r["user_id"], r["ETNR"]): r.asDict(recursive=True) for r in tpls.collect()}
    g = legs[(1, 1)]["geometry"]
    assert [(p["lon"], p["lat"]) for p in g] == [
        (8.50, 47.40), (8.505, 47.404), (8.51, 47.41)
    ]
    g2 = legs[(1, 2)]["geometry"]  # multi-part: flattened, 4 vertices
    assert [(p["lon"], p["lat"]) for p in g2] == [
        (8.51, 47.41), (8.52, 47.42), (8.53, 47.43), (8.55, 47.45)
    ]
    assert legs[(2, 1)]["geometry"] is None  # invalid route nulled
    # VP_XY-style fallback still present everywhere (reference note :386)
    assert all(d["geom"] for d in legs.values())


def test_mzmv_staypoint_id_blocks(mzmv):
    trips, sp, tpls = mzmv
    # start-staypoints take ids 0..n-1 (user, ETNR order), trailing block after
    recs = sorted((d["id"], u, d["finished_at"] is None) for (u, _, d) in sp)
    n = len(recs)
    trailing = [r for r in recs if r[2]]
    assert all(r[0] >= n - len(trailing) for r in trailing)
    assert [r[0] for r in recs] == list(range(n))
