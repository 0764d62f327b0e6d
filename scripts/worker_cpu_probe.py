"""Per-process CPU attribution for the bench's tail-inflation mode.

BENCH_r10 (and two r11 reruns) recorded late Python-heavy codec rows at
3-7x their quiet medians with run steal ~0, zero foreign JVMs, and —
once bench.py grew self-CPU telemetry — self_cores ~30: the burn is
OURS. The JVM-GC hypothesis died immediately (gc_sec 0.04 on an
inflated 8.28 s row), which leaves the Python worker pool: with
spark.python.worker.reuse (default true) the same 32 daemon-forked
workers process every Arrow batch of the whole 63-query sequence, so
anything that degrades with worker age (cyclic-GC pressure from
accumulated tracked objects, allocator fragmentation, RSS growth into
page-fault churn) shows up exactly as late-row, Python-heavy,
intermittent inflation that no host-level instrument can separate from
our legitimate work.

This probe runs the headline sequence once (sf0.1, blocks kept, like
the driver's bench) with a 0.5 s sampling thread attributing CPU ticks
to (jvm | python workers | driver) x (user | sys), plus worker RSS and
fault counters, and prints one JSON line per query with the deltas.
Read an inflated row's attribution before theorizing further.

Writes nothing outside /tmp. Run:
    python scripts/worker_cpu_probe.py            # full sequence
    python scripts/worker_cpu_probe.py --only multimodal_mjpeg_avi_roundtrip,...
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

HZ = os.sysconf("SC_CLK_TCK") or 100


def _classify(pid: int) -> str | None:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read().replace(b"\x00", b" ")
    except OSError:
        return None
    if b"pyspark.daemon" in cmd or b"pyspark.worker" in cmd:
        return "worker"
    if b"org.apache.spark.deploy.SparkSubmit" in cmd:
        return "jvm"
    return None


def _stat(pid: int) -> tuple[int, int, int, int, int] | None:
    """(utime, stime, minflt, majflt, rss_pages) for pid."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
    except OSError:
        return None
    # post-comm fields: index 7=minflt, 9=majflt, 11=utime, 12=stime,
    # 21=rss (0-based after the closing paren)
    return (
        int(parts[11]),
        int(parts[12]),
        int(parts[7]),
        int(parts[9]),
        int(parts[21]),
    )


class Sampler(threading.Thread):
    """Accumulates MAX-observed cumulative ticks per (class, metric) —
    pids that die keep their last observation (monotone totals)."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.lock = threading.Lock()
        self.last: dict[int, tuple[str, tuple[int, int, int, int, int]]] = {}
        self.dead: dict[str, list[int]] = {}
        self.rss_peak = 0
        self.stop_flag = False

    def totals(self) -> dict[str, float]:
        with self.lock:
            agg = dict.fromkeys(
                ("jvm_user", "jvm_sys", "worker_user", "worker_sys",
                 "worker_minflt", "worker_majflt"), 0.0)
            for cls, dead in self.dead.items():
                for i, key in enumerate(
                    ("user", "sys", "minflt", "majflt")
                ):
                    k = f"{cls}_{key}"
                    if k in agg:
                        agg[k] += dead[i]
            for _, (cls, st) in self.last.items():
                for i, key in enumerate(("user", "sys", "minflt", "majflt")):
                    k = f"{cls}_{key}"
                    if k in agg:
                        agg[k] += st[i]
            agg["worker_rss_peak_mb"] = self.rss_peak * 4096 / 1e6
            return agg

    def run(self) -> None:
        while not self.stop_flag:
            seen = set()
            for entry in os.listdir("/proc"):
                if not entry.isdigit():
                    continue
                pid = int(entry)
                cls = (
                    self.last[pid][0]
                    if pid in self.last
                    else _classify(pid)
                )
                if cls is None:
                    continue
                st = _stat(pid)
                if st is None:
                    continue
                seen.add(pid)
                with self.lock:
                    self.last[pid] = (cls, st)
                    if cls == "worker":
                        self.rss_peak = max(self.rss_peak, st[4])
            with self.lock:
                for pid in list(self.last):
                    if pid not in seen:  # died: bank its last totals
                        cls, st = self.last.pop(pid)
                        bank = self.dead.setdefault(cls, [0, 0, 0, 0])
                        for i in range(4):
                            bank[i] += st[i]
            time.sleep(0.5)


def main() -> None:
    from ds_mapreduce_spark.plans.registry import load_all
    from ds_mapreduce_spark.session import get_spark

    import bench as B

    names = list(B.HEADLINE)
    if "--only" in sys.argv:
        wanted = sys.argv[sys.argv.index("--only") + 1].split(",")
        names = [n for n in names if n in wanted]

    spark = get_spark("worker-cpu-probe")
    registry = load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sampler = Sampler()
    sampler.start()
    # warm pass, like the bench (workers age through this too)
    for name in names:
        try:
            registry[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    out = []
    for name in names:
        before = sampler.totals()
        t0 = time.monotonic()
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(json.dumps({"q": name, "err": str(exc)[:200]}))
            continue
        wall = time.monotonic() - t0
        time.sleep(0.6)  # let the sampler observe the final ticks
        after = sampler.totals()
        rec = {"q": name, "wall": round(wall, 2)}
        for k in ("jvm_user", "jvm_sys", "worker_user", "worker_sys"):
            rec[k] = round((after[k] - before[k]) / HZ, 1)
        for k in ("worker_minflt", "worker_majflt"):
            rec[k] = int(after[k] - before[k])
        rec["worker_rss_peak_mb"] = round(after["worker_rss_peak_mb"])
        out.append(rec)
        print(json.dumps(rec), flush=True)
    sampler.stop_flag = True


if __name__ == "__main__":
    main()
