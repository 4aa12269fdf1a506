"""Real multi-process (multi-"host") integration test.

The reference is strictly single-process; this framework's scale-out story is
standard JAX SPMD over a global mesh (SURVEY.md §2.3, §5).  Here we actually
run it: two OS processes × 4 virtual CPU devices form an 8-device
`jax.distributed` cluster (Gloo collectives over localhost) and execute the
real FER sweep CLI.  The deterministic key-folding discipline means the
2-process × 4-device run must produce the *byte-identical* CSV of a
1-process × 8-device run — that is the correctness contract for counters
aggregated across DCN.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "mh_fer_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # do not leak the pytest process's device-count / platform settings
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO)
    return env


def _launch(extra_args, out_dir, plot_dir, devices_per_proc):
    # This box can be as small as 2 cores; under xdist-parallel runs the
    # other workers' compiles can starve a cluster process for >30 s —
    # longer than Gloo's hardcoded context-formation deadline.  Being
    # root, give the cluster processes scheduling priority so the
    # rendezvous window stays short.
    nice = ["nice", "-n", "-5"] if os.geteuid() == 0 else []
    return subprocess.Popen(
        [
            *nice,
            sys.executable, str(WORKER),
            "--devices_per_proc", str(devices_per_proc),
            "--out_dir", str(out_dir),
            "--plot_dir", str(plot_dir),
            *extra_args,
        ],
        env=_worker_env(),
        cwd=str(REPO),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


@pytest.mark.slow
@pytest.mark.xdist_group("gloo_cluster")
def test_two_process_sweep_matches_single_process(tmp_path):
    single_dir = tmp_path / "single"
    multi_dir = tmp_path / "multi"

    # 1 process × 8 devices (the reference layout for all other mesh tests)
    p = _launch([], single_dir, tmp_path / "plots1", devices_per_proc=8)
    out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process worker failed:\n{out}"

    # 2 processes × 4 devices over jax.distributed (env-var init path).
    # _free_port is inherently racy (bound, closed, reused later) and CPU
    # starvation under parallel test runs can trip Gloo's 30 s context
    # deadline, so retry on a fresh port before declaring failure.
    for attempt in range(3):
        port = _free_port()
        coord = f"127.0.0.1:{port}"
        procs = [
            _launch(
                [
                    "--process_id", str(pid),
                    "--num_processes", "2",
                    "--coordinator", coord,
                ],
                multi_dir,
                tmp_path / "plots2",
                devices_per_proc=4,
            )
            for pid in (0, 1)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            break
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"distributed worker failed:\n{out}"

    single_csv = (single_dir / "fer_M1.csv").read_text()
    multi_csv = (multi_dir / "fer_M1.csv").read_text()
    assert "snr_db" in single_csv
    assert multi_csv == single_csv  # bit-identical counters across DCN

    # only the coordinator writes artifacts
    assert "Saved FER table" in outs[0]
    assert "Saved FER table" not in outs[1]


@pytest.mark.slow
@pytest.mark.xdist_group("gloo_cluster")
def test_two_process_snr_split_matches_single_process(tmp_path):
    """Eb/N0-point work splitting (`--snr_split`, SURVEY §2.3): two processes
    each own one of the two sweep points, simulate it on their LOCAL devices,
    and the merged CSV must be byte-identical to a single-process run of the
    full grid (per-point key folding is process-independent)."""

    single_dir = tmp_path / "single"
    multi_dir = tmp_path / "multi"
    grid = ["--snr_hi", "2.5"]  # two points: 2.0, 2.5 dB

    p = _launch(grid, single_dir, tmp_path / "plots1", devices_per_proc=8)
    out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, f"single-process worker failed:\n{out}"

    for attempt in range(3):
        port = _free_port()
        coord = f"127.0.0.1:{port}"
        procs = [
            _launch(
                [
                    "--process_id", str(pid),
                    "--num_processes", "2",
                    "--coordinator", coord,
                    "--snr_split",
                    *grid,
                ],
                multi_dir,
                tmp_path / "plots2",
                devices_per_proc=4,
            )
            for pid in (0, 1)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            break
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"snr-split worker failed:\n{out}"

    single_csv = (single_dir / "fer_M1.csv").read_text()
    multi_csv = (multi_dir / "fer_M1.csv").read_text()
    assert single_csv.count("\n") == 3  # header + 2 points
    assert multi_csv == single_csv  # bit-exact merge of split-owned rows


def test_cluster_marker_fallback_is_graceful():
    """A cluster marker without a resolvable cluster must warn and fall back
    to single-process, not crash (maybe_distributed_init auto-detect path)."""

    code = (
        "import os, warnings\n"
        # multi-process-looking markers without a real SLURM environment
        "os.environ['SLURM_JOB_ID'] = '1234'\n"
        "os.environ['SLURM_NTASKS'] = '2'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from polar_code_tpu.parallel.mesh import maybe_distributed_init\n"
        "with warnings.catch_warnings(record=True) as w:\n"
        "    warnings.simplefilter('always')\n"
        "    multi = maybe_distributed_init()\n"
        "assert multi is False, multi\n"
        "assert jax.process_count() == 1\n"
        "assert any('auto-detection failed' in str(x.message) for x in w), "
        "[str(x.message) for x in w]\n"
        "print('fallback ok')\n"
    )
    p = subprocess.run(
        [sys.executable, "-c", code], env=_worker_env(), cwd=str(REPO),
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stdout + p.stderr
    assert "fallback ok" in p.stdout


def test_single_process_markers_stay_silent():
    """Markers that ordinary single-process environments carry (a bare k8s
    service host, a 1-task SLURM allocation) must not trip auto-detection
    or emit warnings (VERDICT r1 weak #6)."""

    code = (
        "import os, warnings\n"
        "os.environ['KUBERNETES_SERVICE_HOST'] = '10.0.0.1'\n"
        "os.environ['SLURM_JOB_ID'] = '1234'\n"   # no/1 NTASKS -> not multi
        "os.environ['SLURM_NTASKS'] = '1'\n"
        "os.environ['TPU_WORKER_HOSTNAMES'] = 'host0'\n"  # single host
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from polar_code_tpu.parallel.mesh import maybe_distributed_init\n"
        "with warnings.catch_warnings(record=True) as w:\n"
        "    warnings.simplefilter('always')\n"
        "    multi = maybe_distributed_init()\n"
        "assert multi is False, multi\n"
        "ours = [x for x in w if 'auto-detection' in str(x.message)]\n"
        "assert not ours, [str(x.message) for x in ours]\n"
        "print('silent ok')\n"
    )
    p = subprocess.run(
        [sys.executable, "-c", code], env=_worker_env(), cwd=str(REPO),
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stdout + p.stderr
    assert "silent ok" in p.stdout
