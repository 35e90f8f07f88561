import logging

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from raydedup import corpus
    return corpus.generate(200, seed=42)


@pytest.fixture(scope="session")
def tiny_result(tiny_corpus):
    """Flagship pipeline output on the tiny corpus, shared across tests."""
    import ray.data as rd

    from raydedup.issues import IssueType
    from raydedup.pipeline import run_pipeline

    code, truth = tiny_corpus
    res = run_pipeline(rd.from_arrow(code),
                       issues_to_detect=[IssueType.NEAR_DUPLICATES,
                                         IssueType.OFF_TOPIC,
                                         IssueType.LABEL_ERRORS])
    return res, truth
