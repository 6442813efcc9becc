"""Behavioral tests for the wedge-resilient runner (scripts/supervise.sh):
retry-on-failure, success exit, stall-kill-relaunch, and give-up."""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "supervise.sh")


def _run(tmp_path, watch, stall, attempts, cmd, timeout=60):
    log = str(tmp_path / "run.log")
    env = dict(os.environ, SUPERVISE_POLL="1")
    proc = subprocess.run(
        ["bash", SCRIPT, log, watch, str(stall), str(attempts), "--"] + cmd,
        env=env,
        timeout=timeout,
        capture_output=True,
    )
    with open(log) as f:
        return proc.returncode, f.read()


def test_retries_then_succeeds(tmp_path):
    """A command that fails until a state file accumulates 2 attempts must
    be relaunched and finish OK."""
    state = tmp_path / "count"
    helper = tmp_path / "flaky.sh"
    helper.write_text(
        textwrap.dedent(f"""\
        #!/bin/bash
        echo attempt >> {state}
        [ "$(wc -l < {state})" -ge 2 ] && exit 0
        exit 1
        """)
    )
    rc, log = _run(tmp_path, str(tmp_path), 30, 5, ["bash", str(helper)])
    assert rc == 0
    assert "finished OK" in log
    assert state.read_text().count("attempt") == 2


def test_gives_up_after_max_attempts(tmp_path):
    rc, log = _run(tmp_path, str(tmp_path), 30, 2, ["false"])
    assert rc == 1
    assert "giving up after 2 attempts" in log


def test_stall_detection_kills_and_relaunches(tmp_path):
    """A command that hangs without output must be killed on stall; the
    relaunch (which finds the marker from attempt 1) succeeds."""
    marker = tmp_path / "marker"
    helper = tmp_path / "hang.sh"
    helper.write_text(
        textwrap.dedent(f"""\
        #!/bin/bash
        if [ -f {marker} ]; then echo done; exit 0; fi
        touch {marker}
        sleep 600
        """)
    )
    # watch a quiet directory; stall after 2s of silence
    quiet = tmp_path / "quiet"
    quiet.mkdir()
    rc, log = _run(
        tmp_path, str(quiet), 2, 3, ["bash", str(helper)], timeout=90
    )
    assert rc == 0
    assert "stall: no output" in log
    assert "finished OK" in log
