#!/usr/bin/env python3
"""Third-party validation of the SpatiaLite writer (and gpkg multi-layer
writer) with REAL SQLite: schema integrity, catalog rows, rtree window
queries against the hand-built idx_ shadow trees, and serialized-geometry
blob framing parsed independently with struct.

Usage:
  sbt "runMain graft.tools.WriteSpatiaLiteCheck"
  python3 tools/check_spatialite_write.py
"""
import sqlite3
import struct


def check_single(path="/tmp/sl_check.sqlite"):
    con = sqlite3.connect(path)
    ok = con.execute("PRAGMA integrity_check").fetchone()
    print(path, "integrity:", ok)
    assert ok == ("ok",)
    gc = con.execute(
        "SELECT f_table_name, f_geometry_column, srid, spatial_index_enabled "
        "FROM geometry_columns").fetchall()
    print("geometry_columns:", gc)
    assert gc == [("pts", "geom", 4326, 1)]
    srs = con.execute(
        "SELECT srid, auth_name, auth_srid FROM spatial_ref_sys").fetchall()
    assert (4326, "EPSG", 4326) in srs
    n = con.execute("SELECT count(*) FROM pts").fetchone()[0]
    assert n == 3000, n
    # rtree window query via the real rtree module
    rows = con.execute("""SELECT pkid FROM idx_pts_geom
      WHERE xmax >= 95 AND xmin <= 255 AND ymax >= 95 AND ymin <= 255
      ORDER BY pkid""").fetchall()
    ids = [r[0] for r in rows]
    want = sorted(i + 1 for i in range(3000)
                  if 95 <= (i % 60) * 10.0 <= 255 and 95 <= (i // 60) * 10.0 <= 255)
    print("rtree rows:", len(ids), "expected:", len(want), "match:", ids == want)
    assert ids == want
    # independent blob framing parse: row fid=62 -> i=61 -> x=10, y=10
    blob = con.execute("SELECT geom FROM pts WHERE fid = 62").fetchone()[0]
    assert blob[0] == 0x00 and blob[1] == 0x01 and blob[38] == 0x7C and blob[-1] == 0xFE
    srid, mnx, mny, mxx, mxy = struct.unpack_from("<idddd", blob, 2)
    cls, = struct.unpack_from("<i", blob, 39)
    x, y = struct.unpack_from("<dd", blob, 43)
    assert (srid, cls) == (4326, 1), (srid, cls)
    assert (x, y) == (10.0, 10.0) and (mnx, mny, mxx, mxy) == (10.0, 10.0, 10.0, 10.0)
    print("blob framing ok: srid", srid, "class", cls, "xy", (x, y))


def check_multi(path, layers, geom="geom", catalog="spatialite"):
    con = sqlite3.connect(path)
    ok = con.execute("PRAGMA integrity_check").fetchone()
    print(path, "integrity:", ok)
    assert ok == ("ok",)
    if catalog == "spatialite":
        gc = dict(con.execute(
            "SELECT f_table_name, spatial_index_enabled FROM geometry_columns").fetchall())
        assert gc == {t: 1 for t in layers}, gc
        idx = "idx_{t}_{g}"
    else:
        gc = sorted(r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_geometry_columns").fetchall())
        assert gc == sorted(layers), gc
        cont = sorted(r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents").fetchall())
        assert cont == sorted(layers), cont
        ogr = dict(con.execute(
            "SELECT table_name, feature_count FROM gpkg_ogr_contents").fetchall())
        assert ogr == dict(zip(layers, (500, 120))), ogr
        idx = "rtree_{t}_{g}"
    for t, n in zip(layers, (500, 120)):
        cnt = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
        assert cnt == n, (t, cnt)
        icnt = con.execute(
            f"SELECT count(*) FROM {idx.format(t=t, g=geom)}").fetchone()[0]
        assert icnt == n, (t, icnt)
    print("layers ok:", layers)


if __name__ == "__main__":
    check_single()
    check_multi("/tmp/sl_check_multi.sqlite", ["alpha", "beta"])
    check_multi("/tmp/gpkg_check_multi.gpkg", ["alpha", "beta"], catalog="gpkg")
    print("ALL CHECKS PASSED")
