"""Phase-level serial-time diagnostic for the crawl bench.

The 2-vs-8-core scaling pair fits wall = s + w/N with s ~= 40-45 s at the
800k-doc input — roughly half the 8-core wall is time that does NOT shrink
with cores. This tool localizes it: it runs ONE bench-identical crawl with
the Spark UI enabled and absolute phase windows recorded (DWSC_PHASE_ABS),
then intersects each phase window with the REST API's job intervals
(/api/v1/applications/<id>/jobs) and reports, per phase:

    wall | job-covered time | driver gap (no job running) | #jobs

A large gap = driver-side serial work (Catalyst planning, broadcast
pickling, driver-side bitmap merges, py4j latency). A large covered-but-
non-scaling phase = task-side effect (stragglers, bandwidth).

Usage:  taskset -c 0-7 python tools/phase_diag.py [cpus] [n_docs]
        (pair with SPARK_GRAFT_GC_THREADS=8 for a protocol-identical run)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = int(os.environ.get("DWSC_DIAG_UI_PORT", "4045"))


def _parse_ts(s: str) -> float:
    # REST timestamps look like 2026-08-17T22:30:01.123GMT
    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def _api(path: str):
    base = f"http://localhost:{UI_PORT}/api/v1"
    return json.load(urllib.request.urlopen(base + path))


def fetch_jobs() -> tuple[str, list[dict]]:
    app_id = _api("/applications")[0]["id"]
    return app_id, _api(f"/applications/{app_id}/jobs")


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _tree_cpu_jiffies(root_pid: int) -> int:
    """Total utime+stime jiffies of root_pid and ALL descendants (live
    only — good enough: Spark's JVM and reused python workers persist)."""
    children: dict[int, list[int]] = {}
    stat: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            pid = int(d)
            ppid = int(parts[1])
            stat[pid] = int(parts[11]) + int(parts[12])  # utime + stime
            children.setdefault(ppid, []).append(pid)
        except (OSError, IndexError, ValueError):
            continue
    total, todo = 0, [root_pid]
    while todo:
        p = todo.pop()
        total += stat.get(p, 0)
        todo.extend(children.get(p, []))
    return total


class CpuSampler:
    """Background thread sampling (epoch, tree-cpu-jiffies, steal-jiffies)
    every interval_s, so per-phase CPU consumption can be integrated from
    the absolute phase windows afterwards."""

    def __init__(self, interval_s: float = 0.5):
        import threading

        self.samples: list[tuple[float, int, int]] = []
        self._stop = threading.Event()
        self.interval = interval_s
        self._thr = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        pid = os.getpid()
        while not self._stop.is_set():
            self.samples.append((time.time(), _tree_cpu_jiffies(pid), _steal()))
            self._stop.wait(self.interval)

    def start(self):
        self._thr.start()
        return self

    def stop(self):
        self._stop.set()
        self._thr.join(timeout=5)

    def delta(self, a: float, b: float) -> tuple[float, float]:
        """(cpu_seconds, steal_seconds) consumed in window [a, b] via
        nearest-sample interpolation (jiffies are USER_HZ=100)."""

        def at(t: float, idx: int) -> float:
            if not self.samples:
                return 0.0
            best = min(self.samples, key=lambda s: abs(s[0] - t))
            return best[idx] / 100.0

        return at(b, 1) - at(a, 1), at(b, 2) - at(a, 2)


def coverage(window: tuple[float, float], intervals: list[tuple[float, float]]) -> tuple[float, int]:
    lo, hi = window
    clipped = sorted(
        (max(lo, a), min(hi, b)) for a, b in intervals if b > lo and a < hi
    )
    covered, njobs, cur_end = 0.0, 0, lo
    for a, b in clipped:
        njobs += 1
        if b <= cur_end:
            continue
        covered += b - max(a, cur_end)
        cur_end = b
    return covered, njobs


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
    os.environ["DWSC_PHASE_ABS"] = "1"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from distributed_web_scrapper_and_crawler_spark.session import get_spark

    spark = get_spark(
        app_name="dwsc-phase-diag",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )

    import bench
    from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
    from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine

    corpus, spec = bench._bench_corpus(spark, n_docs)
    corpus = corpus.repartition(64, "doc_id").cache()
    corpus.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    cfg = CrawlConfig(
        parity_mode=False,
        per_host_budget=1 << 17,
        use_bloom=True,
        allowed_domains=("example.test",),
        lazy_output_tables=True,
        fetch_join="copartition",
        collect_fetch_stats=False,
        salt_hot_hosts=8,
        links_kernel=os.environ.get("SPARK_GRAFT_LINKS_KERNEL", "auto"),
    )
    eng = CrawlEngine(spark=spark, corpus=corpus, cfg=cfg, bloom_capacity=1 << 22)
    seeds = [
        f"http://{h}/page/{i}"
        for h in spec.hosts
        for i in range(0, spec.docs_per_host, 3)
    ]
    eng.seed(seeds)
    sampler = CpuSampler().start()
    t0, t0_abs, s0 = time.monotonic(), time.time(), _steal()
    eng.run(max_rounds=4)
    wall = time.monotonic() - t0
    steal = _steal() - s0
    sampler.stop()

    app_id, jobs = fetch_jobs()
    pairs = [
        ((_parse_ts(j["submissionTime"]), _parse_ts(j["completionTime"])), j)
        for j in jobs
        if "completionTime" in j and j.get("submissionTime")
    ]
    intervals = [iv for iv, _ in pairs]

    print(f"\n=== phase_diag cpus={cpus} n_docs={n_docs} wall={wall:.1f}s steal={steal} ticks ===")
    print(
        f"{'round':>5} {'phase':<14} {'wall':>8} {'jobtime':>8} {'gap':>8} {'njobs':>6} "
        f"{'cpu_s':>8} {'eff.cores':>9} {'steal_s':>8}"
    )
    totals: dict[str, list[float]] = {}
    for st in eng.round_stats:
        for name, (a, b) in st.get("phases_abs", {}).items():
            cov, nj = coverage((a, b), intervals)
            w = b - a
            gap = w - cov
            cpu_s, steal_s = sampler.delta(a, b)
            t = totals.setdefault(name, [0.0, 0.0, 0.0, 0.0, 0.0])
            t[0] += w
            t[1] += cov
            t[2] += gap
            t[3] += cpu_s
            t[4] += steal_s
            print(
                f"{st['round']:>5} {name:<14} {w:>8.2f} {cov:>8.2f} {gap:>8.2f} {nj:>6} "
                f"{cpu_s:>8.1f} {cpu_s / max(w, 1e-9):>9.2f} {steal_s:>8.1f}"
            )
    print("--- totals over rounds ---")
    for name, (w, cov, gap, cpu_s, steal_s) in totals.items():
        print(
            f"{'':>5} {name:<14} {w:>8.2f} {cov:>8.2f} {gap:>8.2f} {'':>6} "
            f"{cpu_s:>8.1f} {cpu_s / max(w, 1e-9):>9.2f} {steal_s:>8.1f}"
        )
    acct = sum(t[0] for t in totals.values())
    cov_run, _ = coverage((t0_abs, t0_abs + wall), intervals)
    print(f"run wall {wall:.2f}  phase-accounted {acct:.2f}  unaccounted {wall - acct:.2f}")
    print(f"run-level job coverage {cov_run:.2f}  run-level gap {wall - cov_run:.2f}")
    # the 10 slowest jobs inside the run window, for task-side follow-up
    in_run = [
        (b - a, j.get("name", "")[:90])
        for (a, b), j in pairs
        if a >= t0_abs
    ]
    print("--- slowest jobs in run window ---")
    for dur, name in sorted(in_run, reverse=True)[:12]:
        print(f"  {dur:7.2f}s  {name}")

    # stage-level attribution for the slowest jobs: utilization (sum of
    # task run time / (stage wall x cores)), cpu fraction, straggler ratio
    slow_jobs = sorted(
        (j for (a, b), j in pairs if a >= t0_abs),
        key=lambda j: -(
            _parse_ts(j["completionTime"]) - _parse_ts(j["submissionTime"])
        ),
    )[:6]
    stages = {s["stageId"]: s for s in _api(f"/applications/{app_id}/stages?status=complete")}
    print("--- stage detail for slowest jobs ---")
    print(
        f"{'job':>4} {'stage':>6} {'ntask':>6} {'wall':>7} {'sumrun':>8} {'util':>5} "
        f"{'cpu%':>5} {'gc%':>4} {'maxtask':>8} {'medtask':>8} {'shW MB':>7} {'shR MB':>7} {'name':<40}"
    )
    for j in slow_jobs:
        for sid in j.get("stageIds", []):
            s = stages.get(sid)
            if not s or not s.get("completionTime"):
                continue
            sw = _parse_ts(s["completionTime"]) - _parse_ts(s["firstTaskLaunchedTime"])
            sumrun = s["executorRunTime"] / 1000.0
            cpu = s.get("executorCpuTime", 0) / 1e9
            gc = s.get("jvmGcTime", 0) / 1000.0
            util = sumrun / (sw * cpus) if sw > 0 else 0
            try:
                q = _api(
                    f"/applications/{app_id}/stages/{sid}/0/taskSummary?quantiles=0.5,1.0"
                )["executorRunTime"]
                med, mx = q[0] / 1000.0, q[1] / 1000.0
            except Exception:
                med = mx = float("nan")
            print(
                f"{j['jobId']:>4} {sid:>6} {s['numCompleteTasks']:>6} {sw:>7.2f} {sumrun:>8.2f} "
                f"{util:>5.2f} {100*cpu/max(sumrun,1e-9):>5.0f} {100*gc/max(sumrun,1e-9):>4.0f} "
                f"{mx:>8.2f} {med:>8.2f} {s.get('shuffleWriteBytes',0)/1e6:>7.1f} "
                f"{s.get('shuffleReadBytes',0)/1e6:>7.1f} {s.get('name','')[:40]:<40}"
            )


if __name__ == "__main__":
    main()
