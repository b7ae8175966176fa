"""PPI induction variant of the flagship + events sessionization."""

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_flagship_ppi_variant(small_corpus, tmp_path):
    from unmixing_ray.pipelines import flagship
    from unmixing_ray.sources import synth
    from unmixing_ray.state import manifest as ckpt
    res = flagship.run_flagship(
        small_corpus, str(tmp_path / "ppi"), tile=synth.TILE,
        cell_level=synth.CELL_LEVEL, q=3, k_knn=0, induce="ppi")
    ab = ckpt.read_output(res["abundances_dir"])
    assert ab.num_rows == 40 * 4
    assert res["endmembers"].shape == (3, 6)
    a = np.frombuffer(ab["abundance"][0].as_py(), dtype=np.float32)
    assert np.allclose(a.reshape(3, -1).sum(axis=0), 1.0, atol=1e-5)


def test_sessionize_gap_semantics(ray_session):
    import pandas as pd
    import ray.data
    from unmixing_ray.stages import events as ev
    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:10:00",
        "2024-01-01 01:30:00",                       # > 30 min gap
        "2024-01-01 01:40:00",
    ])
    rows = [{"user_id": 1, "event_id": i, "ts": t}
            for i, t in enumerate(ts)]
    rows += [{"user_id": 2, "event_id": 99, "ts": ts[0]}]
    out = ev.sessionize(ray.data.from_items(rows)).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_id")
    assert u1["session_id"].tolist() == [0, 1]
    assert u1["n_events"].tolist() == [2, 2]
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and u2.iloc[0]["n_events"] == 1
