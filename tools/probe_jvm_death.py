"""Probe: kill the session JVM mid-suite and verify the conftest
health-check rebuilds it (VERDICT r14 #5 done-criterion).

Builds a throwaway two-module suite in a temp dir — module A SIGKILLs
the session JVM from inside (the ProcessHandle pid is the JVM's own),
module B then runs ordinary Spark work — copies tests/conftest.py next
to it, and runs pytest. Before the module-scoped health fixture, B's
tests failed with EOFError on the dead gateway (the r14 judge-run
signature: 17 false failures from one host event); with it, the probe
expects 3/3 green.

Usage: python tools/probe_jvm_death.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODULE_A = '''
import os, signal, time


def test_work_then_kill_jvm(spark):
    assert spark.range(5).count() == 5
    pid = int(
        spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
    )
    os.kill(pid, signal.SIGKILL)
    time.sleep(2)  # let the gateway notice


def test_same_module_after_death_may_fail_is_not_run(spark):
    # module scope: the blast radius is THIS module; this test would
    # see the corpse. The probe only asserts the NEXT module recovers,
    # so keep this one trivial and JVM-free.
    assert True
'''

MODULE_B = '''
from pyspark.sql import functions as F


def test_next_module_gets_rebuilt_session(spark):
    # the health probe must have detected the corpse and relaunched
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    assert df.count() == 100
    assert df.agg(F.sum("x")).collect()[0][0] == 9900
'''


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="jvmdeath_")
    try:
        shutil.copy(
            os.path.join(REPO, "tests", "conftest.py"),
            os.path.join(tmp, "conftest.py"),
        )
        with open(os.path.join(tmp, "test_a_kill.py"), "w") as f:
            f.write(MODULE_A)
        with open(os.path.join(tmp, "test_b_recover.py"), "w") as f:
            f.write(MODULE_B)
        proc = subprocess.run(
            [
                sys.executable, "-m", "pytest", tmp, "-q", "-p",
                "no:cacheprovider",
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        print(proc.stdout[-1500:])
        if proc.returncode != 0:
            print(proc.stderr[-1500:], file=sys.stderr)
            print("PROBE FAILED: suite did not survive the JVM death")
            return 1
        print("PROBE OK: JVM killed mid-suite, next module rebuilt")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
