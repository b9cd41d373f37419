import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus():
    """Deterministic synthetic corpus (small) + golden tables."""
    from ferenda_ray.corpus import CorpusSpec, generate
    return generate(CorpusSpec(n_files=60))


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from ferenda_ray.corpus import CorpusSpec, write_corpus
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(CorpusSpec(n_files=60), str(d))
    return str(d)
