"""tile_mosaic: per-tile pyramid rendering, verified quadrant-by-quadrant
against an independent decode+resize of the selected source images."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark import functions as s2f
from s2geometry_spark.kernels import imagecodec
from s2geometry_spark.operators import image_pipeline as ip
from s2geometry_spark.operators.image_pipeline import tile_mosaic
from s2geometry_spark.sources import images as imgsrc

N = 400
LEVEL = 3
GRID = 2
THUMB = 16


@pytest.fixture(scope="module")
def geo(spark):
    return ip.with_geotag(imgsrc.images_df(spark, N))


def test_mosaic_quadrants_match_sources(spark, geo):
    out = {r[f"cell_l{LEVEL}"]: r for r in tile_mosaic(geo, LEVEL).collect()}
    assert out, "no tiles rendered"
    # independent replay: membership + selection recomputed from the raw
    # table in local pandas, pixels decoded/resized per quadrant
    raw = geo.select(
        "image_id", "bytes", s2f.parent_expr("cell", LEVEL).alias("key")
    ).collect()
    by_tile = {}
    for r in raw:
        by_tile.setdefault(r.key, []).append((r.image_id, bytes(r.bytes)))
    assert set(out) == set(by_tile)
    for key, members in by_tile.items():
        members.sort()
        sel = members[: GRID * GRID]
        row = out[key]
        assert row.n_images == len(sel)
        assert (row.w, row.h) == (GRID * THUMB, GRID * THUMB)
        px, fmt = imagecodec.decode(bytes(row.mosaic))
        assert fmt == "png"
        canvas = np.zeros((GRID * THUMB, GRID * THUMB, 3), np.uint8)
        for slot, (_, buf) in enumerate(sel):
            t = imagecodec.resize_nearest(
                imagecodec.decode(buf)[0], THUMB, THUMB
            )
            r_, c_ = divmod(slot, GRID)
            canvas[
                r_ * THUMB : (r_ + 1) * THUMB, c_ * THUMB : (c_ + 1) * THUMB
            ] = t
        assert np.array_equal(px, canvas)


def test_mosaic_output_shrinks_and_is_deterministic(spark, geo):
    a = sorted(
        (r[f"cell_l{LEVEL}"], r.n_images, bytes(r.mosaic))
        for r in tile_mosaic(geo, LEVEL).collect()
    )
    b = sorted(
        (r[f"cell_l{LEVEL}"], r.n_images, bytes(r.mosaic))
        for r in tile_mosaic(geo.repartition(7), LEVEL).collect()
    )
    assert a == b
    assert len(a) < N
