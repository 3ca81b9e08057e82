"""Async (wait=False) job flows: start → observe EXECUTING → attach →
poll to completion (reference tests' async variants,
tests/test_export.py:55-112 / test_import.py:69-139)."""

import time

from oracledb_datapump_spark import DataPump, Job, JobState
from oracledb_datapump_spark.directives import DirectiveBase as D


def test_async_export_poll(spark, duck, tmp_path):
    dump = str(tmp_path / "async1")
    job = Job(
        "EXPORT", "SCHEMA", dumpfiles=dump, job_name="ASYNC-1",
        directives=[D.INCLUDE_SCHEMA("test1"), D.PARALLEL(2)],
    )
    st = job.run(wait=False, connection=duck, spark=spark)
    assert st.job_state in (
        JobState.EXECUTING.value,
        JobState.COMPLETING.value,
        JobState.COMPLETED.value,  # tiny data may finish before we look
    )
    # attach by name while (possibly) running, then poll at a fast rate
    attached = Job.attach("ASYNC-1", dumpdir=dump)
    info = attached.poll_for_completion(rate=0.2)
    assert info.job_state == JobState.COMPLETED.value
    assert any(
        w.name == "test1.lineitem" and w.completed_rows == 6000
        for w in info.job_status.worker_status_list
    )


def test_async_poll_via_protocol(spark, duck, tmp_path):
    dump = str(tmp_path / "async2")
    Job(
        "EXPORT", "TABLE", dumpfiles=dump, job_name="ASYNC-2",
        directives=[D.INCLUDE_SCHEMA("test1"), D.INCLUDE_TABLE("orders")],
    ).run(wait=False, connection=duck, spark=spark)
    resp = DataPump.submit(
        {
            "request": "POLL",
            "payload": {"job_name": "ASYNC-2", "dumpdir": dump, "rate": 0.2},
        }
    )
    assert resp.state == JobState.COMPLETED.value

    # wait for the worker thread to deregister, then STATUS still works
    # from the dump-set artifacts alone
    for _ in range(50):
        from oracledb_datapump_spark.status import job_exists

        if not job_exists("ASYNC-2"):
            break
        time.sleep(0.1)
    resp = DataPump.submit(
        {"request": "STATUS", "payload": {"job_name": "ASYNC-2", "dumpdir": dump}}
    )
    assert resp.state == JobState.COMPLETED.value


def test_poll_terminates_on_error_state():
    """A failed async job sets ERROR; poll (default timeout=None) must
    treat it as terminal rather than spinning forever."""
    from oracledb_datapump_spark.status import poll_for_completion

    assert poll_for_completion(lambda: "ERROR", rate=0.01) == "ERROR"
    assert poll_for_completion(lambda: "NOT_RUNNING", rate=0.01) == "NOT_RUNNING"
