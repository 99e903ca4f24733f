"""Subprocess-driven test of the train.sh supervisor state machine.

The reference's operational resilience layer (train.sh:36-148, SURVEY §5.3):
two supervised setsid process groups, liveness polling, kill-both-on-death,
STOP mode, and cmd.txt stop/restart control. This drives OUR train.sh with
stub child commands and fast intervals (POLL_S/KILL_WAIT_S overrides) and
observes every transition:

  child death -> both groups killed -> STOP -> 'restart' in cmd.txt ->
  relaunch -> 'stop' in cmd.txt -> both killed.

No TPU, no trainer — pure process semantics.
"""

import os
import signal
import subprocess
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_SH = os.path.join(REPO, "train.sh")


def _pgids(log_text, kind):
    return [int(l.rsplit("=", 1)[1])
            for l in log_text.splitlines()
            if l.startswith(f"[supervisor] {kind} pgid=")]


def _alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def _wait(pred, timeout=15.0, step=0.1):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(step)
    return False


@pytest.fixture
def supervisor(tmp_path):
    cmd_file = tmp_path / "cmd.txt"
    log_dir = tmp_path / "logs"
    out = tmp_path / "supervisor.out"
    env = dict(
        os.environ,
        CMD_FILE=str(cmd_file),
        LOG_DIR=str(log_dir),
        POLL_S="0.2",
        KILL_WAIT_S="0.2",
        TOOL_CMD="sleep 600",
        TRAINER_CMD="sleep 600",
    )
    with open(out, "w") as f:
        proc = subprocess.Popen(["bash", TRAIN_SH], env=env, cwd=REPO,
                                stdout=f, stderr=subprocess.STDOUT)
    try:
        yield proc, cmd_file, out
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=10)


def read(out):
    return open(out).read()


def test_supervisor_full_lifecycle(supervisor):
    proc, cmd_file, out = supervisor

    # 1) both groups launched
    assert _wait(lambda: len(_pgids(read(out), "trainer")) == 1
                 and len(_pgids(read(out), "tool server")) == 1)
    trainer0 = _pgids(read(out), "trainer")[0]
    tool0 = _pgids(read(out), "tool server")[0]
    assert _alive(trainer0) and _alive(tool0)

    # 2) trainer death -> supervisor kills the tool group too, enters STOP
    os.killpg(trainer0, signal.SIGKILL)
    assert _wait(lambda: "trainer died" in read(out)), read(out)
    assert _wait(lambda: not _alive(tool0)), "tool group must die with trainer"
    # STOP mode: nothing relaunches on its own
    time.sleep(1.0)
    assert len(_pgids(read(out), "trainer")) == 1

    # 3) 'restart' in cmd.txt -> both groups relaunched, cmd.txt consumed
    cmd_file.write_text("restart\n")
    assert _wait(lambda: len(_pgids(read(out), "trainer")) == 2), read(out)
    trainer1 = _pgids(read(out), "trainer")[1]
    tool1 = _pgids(read(out), "tool server")[1]
    assert _wait(lambda: _alive(trainer1) and _alive(tool1))
    assert _wait(lambda: cmd_file.read_text().strip() == "")

    # 4) 'stop' in cmd.txt -> both killed, supervisor stays up in STOP
    cmd_file.write_text("stop\n")
    assert _wait(lambda: "stop requested" in read(out)), read(out)
    assert _wait(lambda: not _alive(trainer1) and not _alive(tool1))
    assert proc.poll() is None, "supervisor itself must keep running in STOP"
    # the supervisor truncates cmd.txt only AFTER stop_all completes — a
    # 'restart' written inside that window would be clobbered (same
    # semantics as the reference); wait for the truncation
    assert _wait(lambda: cmd_file.read_text() == "")

    # 5) restart works again out of an operator stop
    cmd_file.write_text("restart\n")
    assert _wait(lambda: len(_pgids(read(out), "trainer")) == 3), read(out)
    trainer2 = _pgids(read(out), "trainer")[2]
    assert _wait(lambda: _alive(trainer2))


def test_supervisor_sigterm_cleans_up(supervisor):
    """INT/TERM trap: supervisor exit kills both supervised groups."""
    proc, _cmd, out = supervisor
    assert _wait(lambda: len(_pgids(read(out), "trainer")) == 1)
    trainer0 = _pgids(read(out), "trainer")[0]
    tool0 = _pgids(read(out), "tool server")[0]
    assert _alive(trainer0) and _alive(tool0)
    proc.send_signal(signal.SIGTERM)
    assert proc.wait(timeout=10) == 0
    assert _wait(lambda: not _alive(trainer0) and not _alive(tool0))
