"""Shared pytest fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_project_spotify_app_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # invariance-sweep knobs (NOTES_r9/r10): results must not depend on
    # the shuffle partition count or on AQE's runtime re-planning
    nparts = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8"))
    extra = {}
    if os.environ.get("SPARK_GRAFT_TEST_AQE", "").lower() in ("0", "false"):
        extra["spark.sql.adaptive.enabled"] = "false"
    # whole-stage-codegen-off sweep axis (VERDICT r13 item 2): the
    # interpreted expression path is a different numeric/null-handling
    # code path — the same divergence class the AQE-off sweep caught
    if os.environ.get("SPARK_GRAFT_TEST_CODEGEN", "").lower() in (
        "0",
        "false",
    ):
        extra["spark.sql.codegen.wholeStage"] = "false"
    s = get_spark(
        app_name="tests", shuffle_partitions=nparts, extra_conf=extra
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE
