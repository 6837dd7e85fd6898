"""Planet-scale join path: the J1 cell join with broadcast disabled must
produce identical crossings via sort-merge/shuffle-hash on the cell key —
the strategy used when the tripline index exceeds executor memory."""

import pandas as pd

from traffic_engine_spark.plans import match as M


def test_sort_merge_join_path_matches_broadcast(spark, spark_network, images_pd):
    segs, tls, _ = spark_network
    images = spark.createDataFrame(images_pd)
    pairs = M.pair_fixes(M.decode_fixes(images))
    tli = M.tripline_cell_index(tls)

    bc = M.find_crossings(pairs, tli, broadcast_triplines=True).toPandas()
    smj = M.find_crossings(pairs, tli, broadcast_triplines=False).toPandas()

    key = ["trace_id", "seq", "time", "segment_id", "tripline_index", "tripline_id", "tile_x", "tile_y"]
    a = bc[key].sort_values(key).reset_index(drop=True)
    b = smj[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
