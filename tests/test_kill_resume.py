"""End-to-end interrupted-resume: SIGKILL a real ``jobs/build_graph.py``
subprocess mid-chunk, resume via the lineage table, prove no triple is
lost or duplicated.

The test_lineage.py crash tests inject a Python exception inside the
same process — they can't prove the layout survives an actual process
death (kill -9 reaps the JVM mid-write: half-written parquet parts,
``_temporary`` staging dirs, a chunk whose outputs landed but whose
lineage record didn't). This test does the real thing the north rule's
checkpoint/resume requirement is about: a clean run, a killed run, and
a resumed run must all converge to byte-identical triple sets
(content-hash skolemization makes chunk re-runs idempotent).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD_GRAPH = os.path.join(REPO, "jobs", "build_graph.py")


def _lineage_done(out_dir):
    """Completed chunks, judged as resume does: lineage is one
    partitioned write per batch (dynamic overwrite), so a chunk=N dir
    containing committed parquet files exists only after the batch's
    job committed — a killed mid-write leaves its data in _temporary
    and the chunk correctly stays pending."""
    root = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(root):
        return set()
    done = set()
    for d in os.listdir(root):
        if not d.startswith("chunk="):
            continue
        sub = os.path.join(root, d)
        if any(f.endswith(".parquet") for f in os.listdir(sub)):
            done.add(int(d.split("=", 1)[1]))
    return done


def _triple_rows(spark, out_dir):
    from kgt.spark.lineage import read_triples

    return {
        tuple(r)
        for r in read_triples(spark, out_dir)
        .select("conv_id", "stmt_idx", "subj", "pred", "obj", "is_quoted")
        .collect()
    }


@pytest.mark.spark
def test_sigkill_mid_chunk_then_resume(spark, sf_dir, tmp_path):
    n_chunks = 8
    killed_dir = str(tmp_path / "killed_run")
    args = [
        sys.executable,
        BUILD_GRAPH,
        "--input", sf_dir,
        "--synthetic-orders",
        "--output", killed_dir,
        "--chunks", str(n_chunks),
        "--batch-chunks", "1",  # sequential fine-grained jobs: widest kill window
        "--cpus", "4",
    ]
    # stderr to a file, not a pipe: Spark's log volume would fill a
    # 64 KiB pipe buffer and block the subprocess before the kill
    errlog = open(tmp_path / "killed_run.stderr", "w+b")
    proc = subprocess.Popen(
        args,
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=errlog,
        start_new_session=True,  # own process group: the kill reaps the JVM too
    )
    # wait for the first completed-chunk record, then kill hard while
    # the remaining chunks are in flight (each chunk job runs ~4 s; the
    # 0.1 s poll cannot miss a 1..n_chunks-1 window)
    deadline = time.time() + 180
    try:
        while not _lineage_done(killed_dir):
            if proc.poll() is not None:
                errlog.seek(0)
                err = errlog.read().decode(errors="replace")[-2000:]
                pytest.fail(
                    f"build_graph exited (rc={proc.returncode}) before any "
                    f"lineage record landed:\n{err}"
                )
            if time.time() > deadline:
                pytest.fail("no lineage record within 180 s")
            time.sleep(0.1)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
    proc.wait(timeout=30)
    errlog.close()
    assert proc.returncode != 0  # it died, it did not finish

    done_after_kill = _lineage_done(killed_dir)
    assert 1 <= len(done_after_kill) < n_chunks, done_after_kill

    # resume through the SAME entry point (the CLI path a user reruns),
    # in-process on the shared test session
    import jobs.build_graph as bg

    bg.main(
        [
            "--input", sf_dir,
            "--synthetic-orders",
            "--output", killed_dir,
            "--chunks", str(n_chunks),
            "--batch-chunks", "1",
            "--resume",
        ],
        stop_session=False,
    )
    assert _lineage_done(killed_dir) == set(range(n_chunks))

    # ground truth: a clean never-interrupted run over the same input
    from kgt.spark.lineage import run_extraction, stage_input
    from kgt.spark.transcripts import orders_transcripts

    clean_dir = str(tmp_path / "clean_run")
    tx = orders_transcripts(spark, sf_dir, with_errors=True)
    stage_input(tx, clean_dir, n_chunks)
    run_extraction(spark, clean_dir, "clean", n_chunks=n_chunks)

    resumed = _triple_rows(spark, killed_dir)
    clean = _triple_rows(spark, clean_dir)
    assert resumed == clean  # nothing lost, nothing extra
    # and nothing duplicated within the resumed output (set-equality
    # above can't see dup rows; count equality can)
    from kgt.spark.lineage import read_triples

    assert read_triples(spark, killed_dir).count() == len(clean)
