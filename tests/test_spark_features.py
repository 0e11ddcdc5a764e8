"""Spark features_long (43 and 121 cols) == local batched kernel output."""

import numpy as np
import pandas as pd
import pytest

from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.engine.features_job import (
    features_long, feature_columns_for,
)

CFG43 = FeatureConfig(atr_period=14)
CFG121 = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                      atr_period=14)


@pytest.fixture(scope="module")
def doc_df(spark, corpus_parquet):
    return spark.read.parquet(corpus_parquet)


def _local_expected(doc_pdf, cfg):
    from atr_adaptive_laguerre_spark.data.corpus import tokens_to_ohlcv_batched
    from atr_adaptive_laguerre_spark.engine.features_job import (
        _features_on_docs,
    )

    return (pd.concat(list(_features_on_docs(doc_pdf, cfg)))
            .sort_values(["source", "doc_id", "offset"])
            .reset_index(drop=True))


@pytest.mark.parametrize("cfg", [CFG43, CFG121], ids=["43", "121"])
def test_spark_features_match_local(spark, doc_df, cfg):
    got = (features_long(doc_df, cfg).toPandas()
           .sort_values(["source", "doc_id", "offset"])
           .reset_index(drop=True))
    doc_pdf = doc_df.toPandas()
    want = _local_expected(doc_pdf, cfg)
    cols = feature_columns_for(cfg)
    assert list(got.columns) == ["source", "doc_id", "offset", "token"] + cols
    assert len(got) == len(want) == doc_pdf["n_tok"].sum()
    np.testing.assert_array_equal(got["token"].to_numpy(np.int64),
                                  want["token"].to_numpy(np.int64))
    for c in cols:
        np.testing.assert_array_equal(
            got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
