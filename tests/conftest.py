from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from pdf_extractor_spark.plans.session import build_session

    s = build_session(
        app="pdf_extractor_spark_tests",
        cores=2,
        shuffle_partitions=4,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()
