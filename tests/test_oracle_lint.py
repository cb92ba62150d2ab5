"""Every oracle must expose only driver-proven column types.

See tools/lint_oracles.py for the round-5 forensics (HUGEINT exposure
was the entire driver-failure class). DuckDB-only: fast, no Spark.
"""

import os

from tools.lint_oracles import lint

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_oracles_expose_only_whitelisted_types():
    problems = lint(SF_DIR)
    assert not problems, "\n".join(problems)
