"""Native tick-telemetry ring log (runtime/ticklog.cc + ctypes binding).

Covers the ring semantics (wraparound, eviction, last-k ordering), restart
persistence (the crash-survival contract serving depends on), cross-process
reads, and the error surface. Skips cleanly when no C++ toolchain exists.
"""

import subprocess
import sys

import numpy as np
import pytest

from neurallaplacecontrol_tpu.runtime import ticklog

pytestmark = pytest.mark.skipif(
    ticklog.get_lib() is None, reason="native ticklog unavailable"
)


def _rec(i, width=3):
    return np.asarray([i, 10.0 * i, 100.0 * i][:width], dtype=np.float32)


def test_append_read_roundtrip(tmp_path):
    log = ticklog.TickLog.create(str(tmp_path / "t.tlog"), capacity=8, width=3)
    assert log.count == 0 and log.capacity == 8 and log.width == 3
    for i in range(5):
        assert log.append(_rec(i)) == i + 1
    got = log.read(1, 3)
    np.testing.assert_array_equal(got, np.stack([_rec(i) for i in (1, 2, 3)]))
    np.testing.assert_array_equal(log.last(2), np.stack([_rec(3), _rec(4)]))
    log.close()


def test_wraparound_keeps_newest_in_order(tmp_path):
    log = ticklog.TickLog.create(str(tmp_path / "w.tlog"), capacity=4, width=2)
    for i in range(10):
        log.append(_rec(i, 2))
    assert log.count == 10
    # only the last 4 retained, oldest-first, even when asking for more
    np.testing.assert_array_equal(
        log.last(6), np.stack([_rec(i, 2) for i in (6, 7, 8, 9)])
    )
    # evicted absolute indices raise
    with pytest.raises(IndexError):
        log.read(2, 2)
    # unwritten future indices raise
    with pytest.raises(IndexError):
        log.read(9, 5)
    # retained absolute indices still address correctly across the wrap
    np.testing.assert_array_equal(log.read(7, 2), np.stack([_rec(7, 2), _rec(8, 2)]))
    log.close()


def test_reopen_resumes_after_process_exit(tmp_path):
    """The crash-survival contract: a NEW process appends to the same file
    and sees everything the old one wrote (tl_create reuses a compatible
    existing log)."""
    path = str(tmp_path / "r.tlog")
    code = f"""
import numpy as np
from neurallaplacecontrol_tpu.runtime import ticklog
log = ticklog.TickLog.create({path!r}, capacity=16, width=3)
for i in range(3):
    log.append(np.asarray([i, 10.0*i, 100.0*i], dtype=np.float32))
# no close(), no sync() — simulate an abrupt exit
"""
    subprocess.run([sys.executable, "-c", code], check=True, cwd="/root/repo")

    log = ticklog.TickLog.create(path, capacity=16, width=3)  # resume
    assert log.count == 3
    np.testing.assert_array_equal(log.last(3), np.stack([_rec(i) for i in range(3)]))
    log.append(_rec(3))
    assert log.count == 4
    log.close()

    # a monitoring-style reader attaches without knowing the dims
    reader = ticklog.TickLog.open(path)
    assert reader.count == 4 and reader.width == 3 and reader.capacity == 16
    np.testing.assert_array_equal(reader.last(1), _rec(3)[None])
    reader.close()


def test_dimension_mismatch_and_bad_paths(tmp_path):
    path = str(tmp_path / "d.tlog")
    log = ticklog.TickLog.create(path, capacity=4, width=2)
    with pytest.raises(ValueError):
        log.append(np.zeros(3, np.float32))
    log.close()
    # resuming with different dims must refuse, not corrupt
    with pytest.raises(IOError):
        ticklog.TickLog.create(path, capacity=8, width=2)
    with pytest.raises(IOError):
        ticklog.TickLog.open(str(tmp_path / "missing.tlog"))


def test_create_is_atomic_and_never_deletes_foreign_files(tmp_path):
    """Creation initializes under a temp name and rename(2)s into place, so
    the target path is only ever absent or a complete valid log — and ANY
    pre-existing non-log file (including a zero-filled placeholder, which a
    reclaim-by-zero-magic heuristic would have destroyed) is refused
    untouched."""
    zero_stub = tmp_path / "stub.bin"
    zero_stub.write_bytes(b"\x00" * 64)  # e.g. a user's truncate -s placeholder
    with pytest.raises(IOError):
        ticklog.TickLog.create(str(zero_stub), capacity=4, width=2)
    assert zero_stub.read_bytes() == b"\x00" * 64  # untouched

    foreign = tmp_path / "foreign.bin"
    foreign.write_bytes(b"definitely not a tick log, do not delete me")
    with pytest.raises(IOError):
        ticklog.TickLog.create(str(foreign), capacity=4, width=2)
    assert foreign.read_bytes().startswith(b"definitely")  # untouched

    # fresh create leaves no stray temp files next to the log
    log = ticklog.TickLog.create(str(tmp_path / "fresh.tlog"), capacity=4, width=2)
    log.append(_rec(0, 2))
    log.close()
    assert sorted(p.name for p in tmp_path.iterdir()) == [
        "foreign.bin", "fresh.tlog", "stub.bin",
    ]


def test_cli_tail_reads_live_log(tmp_path):
    """The monitoring CLI attaches to a log written by another process and
    prints the newest records as JSON lines."""
    import json

    path = str(tmp_path / "cli.tlog")
    log = ticklog.TickLog.create(path, capacity=8, width=3)
    for i in range(5):
        log.append(_rec(i))
    log.sync()

    out = subprocess.run(
        [sys.executable, "-m", "neurallaplacecontrol_tpu.runtime.ticklog",
         path, "--last", "2"],
        check=True, capture_output=True, text=True, cwd="/root/repo",
    )
    rows = [json.loads(line) for line in out.stdout.splitlines() if line]
    assert rows == [[3.0, 30.0, 300.0], [4.0, 40.0, 400.0]]
    assert "5 records" in out.stderr
    log.close()


def test_last_on_empty_and_sync(tmp_path):
    log = ticklog.TickLog.create(str(tmp_path / "e.tlog"), capacity=4, width=2)
    assert log.last(3).shape == (0, 2)
    log.append(_rec(0, 2))
    log.sync()  # machine-crash durability path executes
    assert log.count == 1
    log.close()
