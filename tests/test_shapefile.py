"""Self-contained ESRI point-shapefile writer (get_idx_as_shp analogue,
reference lsma.py:92-115). Structural checks against the published
format: header constants, record layout, .shx offsets, dBASE counts,
round-trip, byte determinism."""

import struct

from unmixing_ray.shapefile import read_point_shp, write_point_shp


def test_point_shp_roundtrip(tmp_path):
    pts = [(321675.0, 4701465.0), (321705.0, 4701435.0),
           (322000.5, 4700000.25)]
    base = str(tmp_path / "endmembers")
    paths = write_point_shp(base, pts)
    assert [p.split(".")[-1] for p in paths] == ["shp", "shx", "dbf"]
    assert read_point_shp(base) == pts


def test_shp_header_and_shx(tmp_path):
    pts = [(1.0, 2.0), (3.0, 4.0)]
    base = str(tmp_path / "two")
    write_point_shp(base, pts)
    shp = open(base + ".shp", "rb").read()
    shx = open(base + ".shx", "rb").read()
    assert struct.unpack_from(">i", shp, 0)[0] == 9994
    # file length (16-bit words) recorded in the header matches the file
    assert struct.unpack_from(">i", shp, 24)[0] * 2 == len(shp)
    assert struct.unpack_from(">i", shx, 24)[0] * 2 == len(shx)
    # bbox
    assert struct.unpack_from("<4d", shp, 36) == (1.0, 2.0, 3.0, 4.0)
    # .shx entries point at the records
    off0, words0 = struct.unpack_from(">ii", shx, 100)
    assert (off0, words0) == (50, 10)
    off1, _ = struct.unpack_from(">ii", shx, 108)
    assert off1 == 50 + 4 + 10


def test_dbf_record_count(tmp_path):
    pts = [(float(i), float(-i)) for i in range(7)]
    base = str(tmp_path / "seven")
    write_point_shp(base, pts)
    dbf = open(base + ".dbf", "rb").read()
    assert dbf[0] == 0x03
    n, = struct.unpack_from("<I", dbf, 4)
    header_len, record_len = struct.unpack_from("<HH", dbf, 8)
    assert n == 7 and record_len == 11
    assert len(dbf) == header_len + n * record_len + 1


def test_deterministic_bytes(tmp_path):
    pts = [(9.5, -3.25)]
    b1 = str(tmp_path / "a")
    b2 = str(tmp_path / "b")
    write_point_shp(b1, pts)
    write_point_shp(b2, pts)
    for ext in (".shp", ".shx", ".dbf"):
        assert open(b1 + ext, "rb").read() == open(b2 + ext, "rb").read()


def test_viz_entry_point(tmp_path):
    from unmixing_ray import viz
    base = str(tmp_path / "viaviz")
    viz.endmember_idx_to_shp(base, [(5.0, 6.0)])
    assert read_point_shp(base) == [(5.0, 6.0)]
