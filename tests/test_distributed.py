"""Multi-process jax.distributed smoke (SURVEY §2.3 comm-backend row).

Spawns 2 real OS processes, each owning 4 virtual CPU devices, wired through
``distributed_init`` (localhost coordinator + gloo CPU collectives) and
``get_mesh``; one sharded train step must produce IDENTICAL losses and
updated-parameter digests in both processes, which requires the gradient
psum to actually cross the process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    # Bounded by the communicate(timeout=210) below, not a pytest plugin.
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # The children force the cpu platform themselves (sitecustomize overrides
    # the env var); scrub test-harness state that shouldn't leak in.
    env.pop("PYTEST_CURRENT_TEST", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "heybuddy_tpu.parallel.distributed_smoke",
                str(pid),
                "2",
                f"127.0.0.1:{port}",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=210)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    markers = []
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        lines = [l for l in out.splitlines() if "DISTRIBUTED-SMOKE-OK" in l]
        assert p.returncode == 0 and lines, (
            f"process {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
        )
        markers.append(lines[0])

    # Same loss / global-sum / parameter digest in both processes: the global
    # batch mixes rows only one of them produced, so agreement proves the
    # cross-process collectives ran.
    fields = [dict(kv.split("=") for kv in m.split()[1:]) for m in markers]
    assert fields[0]["loss"] == fields[1]["loss"], markers
    assert fields[0]["gsum"] == fields[1]["gsum"], markers
    assert fields[0]["digest"] == fields[1]["digest"], markers
