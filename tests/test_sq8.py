"""s5_sq8_rerank: independent numpy recomputation of the SQ8
quantize -> integer-Q30 approximate scan -> exact rerank pipeline, so
a same-wrong-both-sides oracle bug can't hide behind the parity gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ae_data_integration_spark.catalog import REGISTRY, load_all, resolve
from ae_data_integration_spark.functions.portable import np_round_half_away
from tests.conftest import SF_SMOKE

load_all()

Q30 = 1 << 30
REFINE, TOPK = 30, 10


def _numpy_sq8(emb: pd.DataFrame):
    ids = emb["vec_id"].to_numpy()
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mn = v.min(axis=0)
    st = np.maximum((v.max(axis=0) - mn) / 255.0, 1e-12)
    code = np.clip(np_round_half_away((v - mn) / st).astype(np.float64), 0.0, 255.0)
    dq = mn + code * st
    out = {}
    for qi in np.flatnonzero((ids % 100 == 0) & (ids < 2000)):
        mask = ids != ids[qi]
        # integer Q30 approximate score, half-away rounding per cell
        s = np_round_half_away(dq[qi] * dq[mask] * Q30).sum(axis=1)
        cand_ids = ids[mask]
        order = np.lexsort((cand_ids, -s))[:REFINE]
        cids = cand_ids[order]
        cv = v[mask][order]
        cos = (cv @ v[qi]) / np.maximum(
            np.linalg.norm(cv, axis=1) * np.linalg.norm(v[qi]), 1e-12
        )
        fin = np.lexsort((cids, -cos))[:TOPK]
        out[int(ids[qi])] = (cids[fin], cos[fin])
    return out


def test_s5_matches_numpy_recompute(spark):
    got = (
        REGISTRY[resolve("s5_sq8_rerank")].fn(spark, SF_SMOKE).toPandas()
    )
    emb = pd.read_parquet(SF_SMOKE + "/embeddings.parquet")
    exp = _numpy_sq8(emb)
    assert set(got["q_id"]) == set(exp)
    for q_id, grp in got.groupby("q_id"):
        grp = grp.sort_values("rk")
        e_ids, e_cos = exp[int(q_id)]
        assert list(grp["rk"]) == list(range(1, len(e_ids) + 1))
        # candidate sets must agree exactly; cos to float tolerance
        # (numpy sums in a different order than the engines' left fold)
        assert list(grp["n_id"]) == list(e_ids)
        np.testing.assert_allclose(grp["cos"].to_numpy(), e_cos, rtol=1e-9)


def test_s5_plan_shape(spark):
    from ae_data_integration_spark.plans import plan_asserts

    df = REGISTRY[resolve("s5_sq8_rerank")].fn(spark, SF_SMOKE)
    pa = plan_asserts(df).no_python_row_udf().has_broadcast_exchange()
    assert "CartesianProduct" not in pa.plan
