"""RLE column kind (the ``spi/block/RunLengthEncodedBlock.java`` analogue).

Storage holds R (value, length) runs; the device expansion is one
searchsorted gather at upload, so host↔device traffic moves runs, not
rows — dense vectors only ever exist in HBM where kernels need them.
"""

import numpy as np
import pytest

from presto_tpu.data import types as T
from presto_tpu.data.column import Column, rle_column
from presto_tpu.data.table import Table
from presto_tpu.exec.columns import from_host
from presto_tpu.exec.runner import LocalRunner


def test_rle_expansion_host():
    c = rle_column(T.BIGINT, [7, 8, 9], [2, 1, 3])
    assert c.row_count == 6
    assert c.to_pylist() == [7, 7, 8, 9, 9, 9]


def test_rle_validity_per_run():
    c = rle_column(T.BIGINT, [1, 2], [2, 2], validity=[True, False])
    assert c.to_pylist() == [1, 1, None, None]


def test_rle_device_expansion():
    c = rle_column(T.BIGINT, [5, 6], [3, 2])
    d = from_host(c)
    assert list(np.asarray(d.values)) == [5, 5, 5, 6, 6]


def test_rle_dictionary_runs():
    c = rle_column(T.varchar(8), [0, 1, 0], [1, 2, 1],
                   dictionary=["lo", "hi"])
    assert c.to_pylist() == ["lo", "hi", "hi", "lo"]
    d = from_host(c)
    assert d.kind == "dict"
    assert list(np.asarray(d.values)) == [0, 1, 1, 0]


def test_rle_queryable_through_engine():
    runner = LocalRunner(scale_factor=0.01)
    runner.datasource.create_table("rlet", Table({
        "k": Column(T.BIGINT, np.arange(6, dtype=np.int64)),
        "grp": rle_column(T.BIGINT, [10, 20], [3, 3]),
        "tag": rle_column(T.varchar(4), [0, 1], [4, 2],
                          dictionary=["aa", "bb"]),
    }))
    try:
        df = runner.run_sql(
            "select grp, count(*) c, max(k) mk from rlet "
            "group by grp order by grp").to_pandas()
        assert list(df["grp"]) == [10, 20]
        assert list(df["c"]) == [3, 3]
        assert list(df["mk"]) == [2, 5]
        df = runner.run_sql(
            "select k from rlet where tag = 'bb' order by k").to_pandas()
        assert list(df["k"]) == [4, 5]
    finally:
        runner.run_sql("drop table rlet")
