"""Report sink (S7) and the pure-python image header parser (M16)."""

import struct

import pandas as pd
import pyarrow as pa
import ray.data as rd

from fide_crawler_ray.sources import report as RP
from fide_crawler_ray.stages.media import parse_image_dims


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 8)


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8


def _jpeg(w, h):
    # SOI, APP0 (minimal), SOF0 with height/width, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_image_dims_formats():
    assert parse_image_dims(_png(640, 480)) == (640, 480)
    assert parse_image_dims(_gif(320, 200)) == (320, 200)
    assert parse_image_dims(_jpeg(1024, 768)) == (1024, 768)
    assert parse_image_dims(b"not an image at all") is None
    assert parse_image_dims(b"\x89PNG\r\n\x1a\n tru") is None  # truncated


def test_write_report_csv_and_md(tmp_path):
    ds = rd.from_arrow(pa.table({
        "segment": pa.array(["A", "B"], pa.string()),
        "revenue": pa.array([1234.5, 99.25], pa.float64()),
    }))
    out = str(tmp_path / "rollup")
    written = RP.write_report(ds, out)
    csv = pd.read_csv(written["csv"])
    assert csv["revenue"].tolist() == [1234.5, 99.25]
    md = open(written["md"]).read()
    assert md.splitlines()[0] == "| segment | revenue |"
    assert "| A | 1234.5000 |" in md
    # atomic replace: a second write overwrites in place
    RP.write_report(csv.assign(revenue=[1.0, 2.0]), out)
    assert pd.read_csv(written["csv"])["revenue"].tolist() == [1.0, 2.0]


def test_store_filter_pushdown(tmp_path):
    """S3: the store reader pushes column pruning and row predicates
    down to the parquet scan."""
    import pyarrow.dataset as pads

    from fide_crawler_ray.sources import store as ST

    t = pa.table({
        "k": pa.array(range(100), pa.int64()),
        "v": pa.array([f"row{i}" for i in range(100)], pa.string()),
        "unused": pa.array([0.0] * 100, pa.float64()),
    })
    root = str(tmp_path / "st")
    assert ST.write_epoch(rd.from_arrow(t), root, "tbl", 1) == 100
    ds = ST.read_all(root, "tbl", columns=["k", "v"],
                     filter=pads.field("k") >= 90)
    df = ds.to_pandas()
    assert list(df.columns) == ["k", "v"]
    assert sorted(df["k"]) == list(range(90, 100))


def test_write_report_row_cap(tmp_path):
    big = pd.DataFrame({"x": range(10)})
    try:
        RP.write_report(big, str(tmp_path / "r"), max_rows=5)
        raise AssertionError("row cap not enforced")
    except ValueError as e:
        assert "report input has" in str(e)
