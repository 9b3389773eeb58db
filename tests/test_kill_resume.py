"""Hard-kill resume: a SIGKILLed run restarts from the last completed shard
(north rule: killed ``ray job submit`` run resumes from checkpoint).

Runs the CLI entrypoint in a SUBPROCESS (own Ray session — does not touch
the test session's Ray), kills it mid-phase-A, re-runs the identical
command, and checks: completed shards were skipped, output is complete and
identical to an uninterrupted run.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
from quickner_ray.sources.pages import write_synth_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_gazetteer_csv(path: str):
    with open(path, "w") as f:
        f.write("name,label\n")
        for name, label in [("table scan", "OP"), ("merge", "OP"), ("spark", "SYS")]:
            f.write(f"{name},{label}\n")


def _cli(input_dir, out_dir, gaz_csv, extra=()):
    return [
        sys.executable,
        "-m",
        "quickner_ray",
        "--input",
        input_dir,
        "--out",
        out_dir,
        "--gazetteer",
        gaz_csv,
        "--shards",
        "4",
        *extra,
    ]


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("RAY_ADDRESS", None)  # subprocess owns a local session
    return env


def test_sigkill_then_resume(tmp_path):
    pages = str(tmp_path / "pages")
    write_synth_pages(pages, "/root/testdata/sf0.001/documents.parquet", repeat=4)
    gaz_csv = str(tmp_path / "entities.csv")
    _write_gazetteer_csv(gaz_csv)
    out = str(tmp_path / "out")

    # start the job; kill it as soon as the first shard manifest lands
    proc = subprocess.Popen(
        _cli(pages, out, gaz_csv),
        env=_env(),
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    manifest_dir = os.path.join(out, "_lineage", "annotated")
    deadline = time.time() + 240
    killed_after = None
    while time.time() < deadline:
        done = len(os.listdir(manifest_dir)) if os.path.isdir(manifest_dir) else 0
        if done >= 1:
            killed_after = done
            proc.send_signal(signal.SIGKILL)
            break
        if proc.poll() is not None:  # finished before we could kill: still valid
            killed_after = 4
            break
        time.sleep(0.25)
    proc.wait(timeout=60)
    assert killed_after is not None, "job never completed a shard within timeout"

    # resume: identical command must finish and skip completed shards
    res = subprocess.run(
        _cli(pages, out, gaz_csv),
        env=_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    assert metrics["stages"]["annotated"]["skipped_shards"] >= min(killed_after, 4) - 1

    # output completeness: triples for all 2000 input docs, same as a clean run
    clean_out = str(tmp_path / "clean")
    res2 = subprocess.run(
        _cli(pages, clean_out, gaz_csv),
        env=_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res2.returncode == 0, res2.stderr[-2000:]

    def _triples(d):
        import pandas as pd

        t = pq.read_table(os.path.join(d, "triples")).to_pandas()
        cols = ["subj", "pred", "obj", "start", "end"]
        return t[cols].sort_values(cols).reset_index(drop=True)

    a, b = _triples(out), _triples(clean_out)
    assert a.equals(b)
    assert len(a) > 0


class TestFingerprintStability:
    def _fp(self, prog: str) -> str:
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, text=True
        )
        assert out.returncode == 0, out.stderr
        return out.stdout.strip()

    def test_nested_lambda_stage_stable_across_processes(self):
        """A stage containing a nested lambda must fingerprint identically
        in fresh processes — repr(co_consts) embedded code-object memory
        addresses and silently invalidated every resume."""
        prog = (
            "import sys; sys.path.insert(0, '/root/repo')\n"
            "from quickner_ray.pipelines.kg import KGPipelineConfig\n"
            "from quickner_ray.kernel.automaton import Gazetteer\n"
            "stage = lambda ds: ds.map_batches(lambda b: b, batch_format='pyarrow')\n"
            "cfg = KGPipelineConfig(extra_stages=(('s', stage),))\n"
            "print(cfg.fingerprint(Gazetteer([('a', 'X')])))\n"
        )
        assert self._fp(prog) == self._fp(prog)

    def test_edited_nested_lambda_invalidates(self):
        base = (
            "import sys; sys.path.insert(0, '/root/repo')\n"
            "from quickner_ray.pipelines.kg import KGPipelineConfig\n"
            "from quickner_ray.kernel.automaton import Gazetteer\n"
            "stage = lambda ds: ds.map_batches(lambda b: {body}, batch_format='pyarrow')\n"
            "cfg = KGPipelineConfig(extra_stages=(('s', stage),))\n"
            "print(cfg.fingerprint(Gazetteer([('a', 'X')])))\n"
        )
        assert self._fp(base.format(body="b")) != self._fp(
            base.format(body="b.slice(0)")
        )
