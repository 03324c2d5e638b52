import os
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
# Ray workers inherit PYTHONPATH (not the driver's sys.path); without this a
# suite run from any cwd other than the repo root fails remote deserialization
# with ModuleNotFoundError on every stage callable.
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    _pp = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + _pp if _pp else "")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_turns(tmp_path_factory):
    """Deterministic ~120-conversation corpus written shuffled across files."""
    from entity_extractor_ray.sources.transcripts import TurnCorpusSpec, write_turns

    out = str(tmp_path_factory.mktemp("turns") / "sf_test")
    write_turns(out, TurnCorpusSpec(n_convs=120, seed=42), num_files=3)
    return out


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
