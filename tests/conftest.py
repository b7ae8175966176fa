import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """A tiny deterministic corpus shared by all tests."""
    from unmixing_ray.sources import synth
    out = tmp_path_factory.mktemp("corpus")
    return synth.generate_corpus(str(out), n_images=40, seed=7)
