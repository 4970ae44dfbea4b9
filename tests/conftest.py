import faulthandler
import logging
import os
import sys
import threading
import time

import pytest
import ray
import ray.data

# --- wedge watchdog -------------------------------------------------------
# Session 11 (and once more in round 3) the 4-CPU suite deadlocked: Ray
# shuffle workers sat idle for 25 minutes with host load ~0; killing and
# rerunning the identical suite passed. No in-repo test legitimately runs
# anywhere near this long, so a per-test deadline turns that wedge into a
# fast, attributed failure instead of a hung CI. Override with
# CRAWLKIT_TEST_TIMEOUT (seconds); 0 disables.

_TEST_TIMEOUT = float(os.environ.get("CRAWLKIT_TEST_TIMEOUT", "600"))


class _Watchdog:
    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.deadline: float | None = None
        self.label = ""
        threading.Thread(target=self._run, daemon=True).start()

    def _run(self) -> None:
        while True:
            time.sleep(5)
            with self.lock:
                deadline, label = self.deadline, self.label
            if deadline is not None and time.time() > deadline:
                msg = (
                    f"\n\n=== crawlkit test watchdog: {label!r} exceeded "
                    f"{_TEST_TIMEOUT:.0f}s — dumping stacks and aborting "
                    "(exit code 70). If host load was ~0 this is the known "
                    "idle-Ray-shuffle wedge (CLAUDE.md): rerun the suite "
                    "before debugging. ===\n"
                )
                # pytest's fd-level capture swallows stderr on a hard
                # exit, so the report also goes to a file that survives
                report = f"/tmp/crawlkit_watchdog_{os.getpid()}.txt"
                try:
                    with open(report, "w") as f:
                        f.write(msg)
                        faulthandler.dump_traceback(file=f)
                except OSError:
                    pass
                sys.stderr.write(msg + f"(stack dump: {report})\n")
                faulthandler.dump_traceback(file=sys.stderr)
                sys.stderr.flush()
                os._exit(70)


_watchdog = _Watchdog() if _TEST_TIMEOUT > 0 else None


@pytest.fixture(autouse=True)
def _test_deadline(request):
    if _watchdog is None:
        yield
        return
    with _watchdog.lock:
        _watchdog.deadline = time.time() + _TEST_TIMEOUT
        _watchdog.label = request.node.nodeid
    yield
    with _watchdog.lock:
        _watchdog.deadline = None


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()
