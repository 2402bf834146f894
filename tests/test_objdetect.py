"""Raster object detection (tf_torch_raster_obj_detect analogue).

Planted-rectangle rasters give closed-form expected detections, so the
tiling / halo / centroid-ownership / NMS plumbing is value-checked
end-to-end (TorchTableFunctions.h:26 output contract)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from heavydb_spark.operators.objdetect import (
    blob_detector,
    raster_obj_detect,
    suppress_overlaps,
    torch_detector,
)


def _raster_with_rects(spark, w, h, rects, hi=200.0, lo=10.0, upp=1.0):
    """Pixel grid (world units = upp per pixel) with axis-aligned
    rectangles of intensity `hi` on a `lo` background."""
    px = F.col("id") % w
    py = (F.col("id") / w).cast("long")
    inside = F.lit(False)
    for x0, y0, rw, rh in rects:
        inside = inside | (
            (px >= x0) & (px < x0 + rw) & (py >= y0) & (py < y0 + rh)
        )
    return spark.range(w * h).select(
        (px * upp).alias("x"),
        (py * upp).alias("y"),
        F.when(inside, F.lit(hi)).otherwise(F.lit(lo)).alias("ch0"),
    )


def test_blob_detector_components_and_boxes():
    tile = np.full((16, 16, 1), 0.1)
    tile[2:5, 3:9, 0] = 0.9   # 6x3 blob
    tile[10:14, 10:12, 0] = 0.8  # 2x4 blob
    boxes = sorted(blob_detector(0.5)(tile))
    assert len(boxes) == 2
    assert boxes[0] == (3.0, 2.0, 9.0, 5.0, pytest.approx(0.9), 0)
    assert boxes[1] == (10.0, 10.0, 12.0, 14.0, pytest.approx(0.8), 0)


def test_blob_detector_diagonal_not_connected():
    # 4-connectivity: diagonal touch = two components
    tile = np.zeros((4, 4, 1))
    tile[0, 0, 0] = 1.0
    tile[1, 1, 0] = 1.0
    assert len(blob_detector(0.5)(tile)) == 2


def test_detect_recovers_planted_rects_across_tiles(spark):
    # 9x core tiles of 32px with halo 8; both rects cross tile borders.
    rects = [(28, 10, 8, 6), (40, 28, 10, 8), (5, 5, 4, 4)]
    r = _raster_with_rects(spark, 96, 96, rects, upp=0.5)
    out = (
        raster_obj_detect(
            r,
            channel_cols=["ch0"],
            x_units_per_pixel=0.5,
            y_units_per_pixel=0.5,
            tile_width=32,
            tile_height=32,
            halo_pixels=8,
        )
        .orderBy("x", "y")
        .collect()
    )
    assert len(out) == len(rects)
    for row, (x0, y0, rw, rh) in zip(out, sorted(rects)):
        assert row["x"] == pytest.approx((x0 + rw / 2) * 0.5)
        assert row["y"] == pytest.approx((y0 + rh / 2) * 0.5)
        assert row["detected_width"] == pytest.approx(rw * 0.5)
        assert row["detected_height"] == pytest.approx(rh * 0.5)
        assert row["detected_class"] == "blob"
        assert row["detected_confidence"] == pytest.approx(200 / 255, abs=1e-4)


def test_detect_boundary_object_emitted_once(spark):
    # Centered exactly on the 4-corner point of tiles (32,32): one owner.
    r = _raster_with_rects(spark, 64, 64, [(29, 29, 6, 6)])
    out = raster_obj_detect(
        r, channel_cols=["ch0"], tile_width=32, tile_height=32,
        halo_pixels=8,
    ).collect()
    assert len(out) == 1
    assert out[0]["x"] == pytest.approx(32.0)


def test_min_confidence_filters(spark):
    r = _raster_with_rects(spark, 32, 32, [(4, 4, 5, 5)], hi=140.0)
    # 140/255 = 0.55 passes detection threshold but not min_confidence
    out = raster_obj_detect(
        r, channel_cols=["ch0"], tile_width=32, tile_height=32,
        halo_pixels=4, min_confidence_threshold=0.75,
    ).collect()
    assert out == []


def test_suppress_overlaps_keeps_best(spark):
    det = spark.createDataFrame(
        [
            # two heavy overlaps, different scores -> keep id 2
            (1, 0, 0.6, 0.0, 0.0, 10.0, 10.0),
            (2, 0, 0.9, 1.0, 1.0, 11.0, 11.0),
            # far away -> kept
            (3, 0, 0.1, 100.0, 100.0, 105.0, 105.0),
            # overlapping but different class -> kept
            (4, 1, 0.2, 0.0, 0.0, 10.0, 10.0),
        ],
        "det_id long, class_idx int, score double, tl_x double, "
        "tl_y double, br_x double, br_y double",
    )
    kept = sorted(
        r["det_id"]
        for r in suppress_overlaps(det, 0.5, cell_size=32.0).collect()
    )
    assert kept == [2, 3, 4]


def test_suppress_overlaps_equal_score_tiebreak(spark):
    det = spark.createDataFrame(
        [
            (7, 0, 0.5, 0.0, 0.0, 10.0, 10.0),
            (9, 0, 0.5, 0.0, 0.0, 10.0, 10.0),
        ],
        "det_id long, class_idx int, score double, tl_x double, "
        "tl_y double, br_x double, br_y double",
    )
    kept = [
        r["det_id"]
        for r in suppress_overlaps(det, 0.5, cell_size=32.0).collect()
    ]
    assert kept == [7]


def test_torch_backend_is_honest_stub():
    with pytest.raises(NotImplementedError):
        torch_detector("/tmp/model.pt")


def test_halo_must_be_smaller_than_tile(spark):
    import pytest
    r = _raster_with_rects(spark, 32, 32, [(4, 4, 5, 5)])
    with pytest.raises(ValueError, match="halo_pixels"):
        raster_obj_detect(
            r, channel_cols=["ch0"], tile_width=16, tile_height=16,
            halo_pixels=20,
        )


def test_identical_duplicate_boxes_get_distinct_ids(spark):
    """A detector emitting byte-identical boxes must yield rows NMS can
    suppress (positional det_id, not a content hash): exactly one of
    the twins survives."""
    def twin_detector(tile):
        boxes = blob_detector(0.5)(tile)
        return boxes + boxes  # every box twice, identical

    r = _raster_with_rects(spark, 32, 32, [(4, 4, 6, 6)])
    out = raster_obj_detect(
        r, channel_cols=["ch0"], tile_width=32, tile_height=32,
        halo_pixels=8, detector=twin_detector, iou_threshold=0.5,
    ).collect()
    assert len(out) == 1
