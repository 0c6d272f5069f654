#!/usr/bin/env python3
"""Third-party validation of the gpkg writer's hand-built R*-tree: query
the shadow trees with REAL SQLite's rtree module (driver-side tooling).

Usage:
  sbt "runMain graft.tools.WriteGpkgRtree"   # writes /tmp/rtree_check.gpkg
  python3 tools/check_gpkg_rtree.py [path]

r14 recorded: integrity_check ok; the windowed rtree query returned
exactly the 256 expected ids out of 3000; full rtree count 3000.
"""
import sqlite3
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtree_check.gpkg"
con = sqlite3.connect(path)
print("integrity:", con.execute("PRAGMA integrity_check").fetchone())
rows = con.execute("""SELECT id FROM rtree_pts_geom
  WHERE maxx >= 95 AND minx <= 255 AND maxy >= 95 AND miny <= 255
  ORDER BY id""").fetchall()
ids = [r[0] for r in rows]
want = sorted(i + 1 for i in range(3000)
              if 95 <= (i % 60) * 10.0 <= 255 and 95 <= (i // 60) * 10.0 <= 255)
print("rtree rows:", len(ids), "expected:", len(want), "match:", ids == want)
print("full rtree count:", con.execute("SELECT count(*) FROM rtree_pts_geom").fetchone())
assert ids == want
