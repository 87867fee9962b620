"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR plus a
synthesized Common-Crawl-style url corpus (FIXTURES.md F1).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "urls_per_sec": ...}

--scaling: runs the headline pipeline in two fresh processes at
GRAFT_SCALE_CPUS (default 2,8) and prints throughputs + efficiency +
the hardware-envelope control (BASELINE.md scaling criterion; sandbox
proxy for N vs 4N nodes).  The result is persisted to
BENCH_SCALING.json and embedded under "scaling" in every subsequent
plain run, so the driver's BENCH artifact is self-contained.
"""

from __future__ import annotations

import json
import os
import sys
import time

# importable regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_ROWS = int(os.environ.get("GRAFT_CORPUS_ROWS", "8000000"))
CORPUS_DIR = "/tmp/dabloomray_bench"


def ensure_corpus(n: int) -> str:
    """Deterministic F1 corpus parquet, generated once and cached.
    Chunked generation keeps peak memory bounded."""
    os.makedirs(CORPUS_DIR, exist_ok=True)
    path = os.path.join(CORPUS_DIR, f"urls_{n}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    import pyarrow.parquet as pq

    from dabloomray.fixtures import make_urls_table

    os.makedirs(path, exist_ok=True)
    chunk = 250_000
    # NOTE: chunked generation must preserve row indices — every column is
    # a pure function of absolute row index, so slices can be generated in
    # parallel processes and still byte-match make_urls_table(n).
    t0 = time.time()
    from concurrent.futures import ProcessPoolExecutor

    spans = [(s, min(s + chunk, n)) for s in range(0, n, chunk)]
    with ProcessPoolExecutor(max_workers=min(16, len(spans))) as ex:
        list(ex.map(_write_slice, [(path, s, e) for s, e in spans]))
    open(done, "w").write(f"rows={n} gen_sec={time.time()-t0:.1f}\n")
    return path


def _write_slice(args) -> None:
    path, start, end = args
    import pyarrow.parquet as pq

    part = make_urls_table_slice(start, end)
    pq.write_table(part, os.path.join(path, f"part-{start:09d}.parquet"),
                   row_group_size=64 * 1024)


def make_urls_table_slice(start: int, end: int):
    """F1 rows [start, end) — same bytes as make_urls_table(n)[start:end]."""
    import numpy as np
    import pyarrow as pa

    from dabloomray import fixtures as fx
    from dabloomray.extract import extract_text

    idx = np.arange(start, end, dtype=np.uint64)
    with np.errstate(over="ignore"):
        host = (idx * np.uint64(2654435761)) % np.uint64(997)
    host = host.astype(np.int64)
    host[(np.arange(start, end) % 97) == 0] = 0
    src = np.arange(start, end)
    dup_mask = (src % 10 == 7) & (src >= 7)
    src = np.where(dup_mask, src - 7, src)

    urls, htmls, texts = [], [], []
    for i in range(end - start):
        j = int(src[i])
        with np.errstate(over="ignore"):
            h = int((np.uint64(j) * np.uint64(2654435761)) % np.uint64(997))
        if j % 97 == 0:
            h = 0
        urls.append(f"https://site{h:04d}.example/p/{j:08d}")
        html = (
            f"<html><head><title>d{j}</title></head>"
            f"<body><p>{' '.join(fx._body_words(j))}</p></body></html>"
        ).encode()
        htmls.append(html)
        texts.append(extract_text(html))
    ts = (np.int64(1_767_225_600_000_000)
          + np.arange(start, end, dtype=np.int64) * 1_000_000)
    langs = [fx._LANGS[i % 5] for i in range(start, end)]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def bench_queries(corpus_path: str):
    """name → zero-arg callable returning row count processed."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from dabloomray.params import ScalingPolicy
    from dabloomray.pipelines.core import (
        build_sketch_hashed,
        check_membership,
        dedup_approx,
    )
    from dabloomray.serde import sketch_from_row
    from dabloomray.sketches.counting import counting_bloom_factory
    from dabloomray.sketches.hll import hll_factory
    from dabloomray.stages.text import QualityScore, token_count_whitespace

    P = 32
    import threading

    # read_parquet planning retries a failing fsspec http import every
    # call; concurrent attempts race the import machinery into a plain
    # ImportError that Ray's except ModuleNotFoundError misses — so
    # serialize planning (execution itself stays concurrent)
    read_lock = threading.Lock()

    def read_urls(columns):
        # without the override Ray splits this small corpus into ~200
        # 5k-row blocks (read_op_min_num_blocks) and per-batch overhead
        # dominates; at real scale blocks are ~128MB and this is moot
        with read_lock:
            return rd.read_parquet(corpus_path, columns=columns,
                                   override_num_blocks=2 * NUM_CPUS)

    state = {}

    cap_per_part = int(CORPUS_ROWS / P * 1.2)  # headroom over distincts

    def q_bloom_build():
        ds = read_urls(["url"])
        out = build_sketch_hashed(
            ds, "url", counting_bloom_factory(cap_per_part, 0.005),
            num_partitions=P)
        state["sketch_table"] = pa.concat_tables(list(
            out.iter_batches(batch_size=None, batch_format="pyarrow")))
        return CORPUS_ROWS

    def q_bloom_check():
        ds = read_urls(["url"])
        out = check_membership(ds, state["sketch_table"], "url",
                               concurrency=max(1, NUM_CPUS - 2))
        n = 0
        for b in out.select_columns(["member"]).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            n += len(b)
        return n

    def q_scaling_dedup():
        ds = read_urls(["url", "warc_ts"])
        ds = ds.map_batches(
            lambda t: t.append_column(
                "seq_id", pc.cast(t.column("warc_ts"), pa.int64())),
            batch_format="pyarrow")
        out = dedup_approx(ds, "url", "seq_id",
                           ScalingPolicy(capacity0=50_000, target_error=0.05),
                           num_partitions=P, payload="mask")
        n = 0
        for b in out.select_columns(["url"]).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            n += len(b)
        # FPR evidence: 90% of corpus rows are unique (FIXTURES F1);
        # survivors below that only by bloom false positives (bound 5%)
        state["dedup_survivors"] = n
        state["dedup_unique_frac"] = round(n / (0.9 * CORPUS_ROWS), 5)
        return n

    def q_scaling_dedup_join():
        """Same dedup as q_scaling_dedup with payload='join' — the
        survivor set stays distributed (Dataset.join left_semi), the
        beyond-10^8-survivors path that 'auto' falls back to.  Measured
        so the mask/join trade (ROADMAP r1 #2) is recorded per round."""
        ds = read_urls(["url", "warc_ts"])
        ds = ds.map_batches(
            lambda t: t.append_column(
                "seq_id", pc.cast(t.column("warc_ts"), pa.int64())),
            batch_format="pyarrow")
        out = dedup_approx(ds, "url", "seq_id",
                           ScalingPolicy(capacity0=50_000, target_error=0.05),
                           num_partitions=P, payload="join")
        n = 0
        for b in out.select_columns(["url"]).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            n += len(b)
        state["dedup_survivors_join"] = n
        return n

    def q_scaling_dedup_rangemask():
        """Dedup with payload='rangemask': survivors spill to seq-range
        buckets, each target task loads only its overlapping buckets —
        no driver mask, no target shuffle (the wide-row scale path for
        seq-ordered input like this time-ordered corpus)."""
        import shutil

        spill = os.path.join(CORPUS_DIR, f"rangemask_{NUM_CPUS}")
        shutil.rmtree(spill, ignore_errors=True)
        ds = read_urls(["url", "warc_ts"])
        ds = ds.map_batches(
            lambda t: t.append_column(
                "seq_id", pc.cast(t.column("warc_ts"), pa.int64())),
            batch_format="pyarrow")
        out = dedup_approx(ds, "url", "seq_id",
                           ScalingPolicy(capacity0=50_000, target_error=0.05),
                           num_partitions=P, payload="rangemask",
                           spill_dir=spill, range_buckets=64)
        n = 0
        for b in out.select_columns(["url"]).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            n += len(b)
        state["dedup_survivors_rangemask"] = n
        return n

    def q_hll_distinct():
        ds = read_urls(["url"])
        tab = pa.concat_tables(list(
            build_sketch_hashed(ds, "url", hll_factory(14),
                                num_partitions=NUM_CPUS)
            .iter_batches(batch_size=None, batch_format="pyarrow")))
        # driver-side merge of NUM_CPUS 16KB register sets — trivial
        hll = None
        for row in tab.to_pylist():
            sk = sketch_from_row(row)
            hll = sk if hll is None else hll.merge(sk)
        state["distinct_est"] = hll.estimate()
        return CORPUS_ROWS

    def q_minhash_bands():
        """MinHash signatures + LSH banding over the corpus text column
        — the near-dup compute kernel (VERDICT r2 #2: shingle
        construction is now byte-level/vectorized; this line tracks
        it per round).  Counts band rows; no candidate join, so the
        number isolates the CPU stage from the exchanges."""
        from dabloomray.pipelines.dedup import MinHashBands

        ds = read_urls(["warc_ts", "text"])
        ds = ds.map_batches(
            lambda t: t.append_column(
                "doc_id", pc.cast(t.column("warc_ts"), pa.int64())),
            batch_format="pyarrow")
        out = ds.map_batches(MinHashBands("doc_id", "text"),
                             batch_format="pyarrow", batch_size=8192)
        n = 0
        for b in out.select_columns(["band_id"]).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            n += len(b)
        return n

    def q_text_stats():
        ds = read_urls(["url", "text"])
        out = ds.map_batches(token_count_whitespace, batch_format="pyarrow")
        # QualityScore is fully vectorized and ~stateless → plain task
        # pool (elastic, no actor-spawn lag)
        out = out.map_batches(QualityScore(), batch_format="pyarrow")
        n = 0
        for b in out.select_columns(["n_tokens", "q_score"]).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            n += len(b)
        return n

    def q_webtext_e2e():
        """Flagship end-to-end job: mask-mode dedup → html→text
        extraction → token/quality stats → fingerprint → parquet out.
        Compute-dominant (extraction), minimal shuffle (28 B/row)."""
        import shutil

        from dabloomray.pipelines.webtext import webtext_pipeline

        out_dir = os.path.join(CORPUS_DIR, f"e2e_out_{NUM_CPUS}")
        shutil.rmtree(out_dir, ignore_errors=True)
        webtext_pipeline(
            corpus_path, out_dir=out_dir,
            policy=ScalingPolicy(capacity0=50_000, target_error=0.05),
            num_partitions=P, override_num_blocks=4 * NUM_CPUS)
        return CORPUS_ROWS

    return {
        "webtext_e2e": q_webtext_e2e,
        "bloom_build": q_bloom_build,
        "bloom_check": q_bloom_check,
        "scaling_dedup": q_scaling_dedup,
        "scaling_dedup_join": q_scaling_dedup_join,
        "scaling_dedup_rangemask": q_scaling_dedup_rangemask,
        "hll_distinct": q_hll_distinct,
        "minhash_bands": q_minhash_bands,
        "text_stats": q_text_stats,
    }, state


def main() -> None:
    import ray

    corpus = ensure_corpus(CORPUS_ROWS)
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm page cache AND the worker pool: run the actual hash kernel on
    # every worker so numpy/pyarrow first-use costs land here, not in the
    # timed region
    import ray.data as rd

    from dabloomray.stages.build import hash_project

    rd.read_parquet(corpus, columns=["url"]).map_batches(
        hash_project("url", 8), batch_format="pyarrow").count()

    qs, state = bench_queries(corpus)
    only = os.environ.get("GRAFT_BENCH_ONLY")
    if only:
        names = [n for n in only.split(",") if n in qs]
    else:
        names = list(qs)
    # per-query MEDIAN of N runs (VERDICT r3 #4): single 32-cpu runs on
    # this sandbox swing ±30% between identical binaries (BASELINE.md
    # hardware control) — the artifact reports the median with min/max
    # alongside so round-over-round comparisons track code, not host
    # lottery.  Queries run back-to-back per repeat, sequentially:
    # concurrent pipelines thrash the shuffle on a small cluster
    # (measured 26.5s sequential vs 36.6s concurrent at 8 cpus).
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            t0 = time.time()
            qs[name]()
            runs[name].append(round(time.time() - t0, 3))
    times = {n: sorted(v)[len(v) // 2] for n, v in runs.items()}
    minmax = {n: [min(v), max(v)] for n, v in runs.items()}
    total = round(sum(times.values()), 3)  # sum of per-query medians
    headline = times.get("webtext_e2e", total)
    print(json.dumps({
        "metric": "webtext e2e (dedup+extract+quality+fingerprint+write) "
                  "over synthetic Common-Crawl-style corpus; suite adds "
                  "sketch build/check/dedup/hll/text micro-pipelines; "
                  "per-query median of N runs (min/max alongside)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_minmax": minmax,
        "repeats": repeats,
        "sf": SF_DIR,
        "corpus_rows": CORPUS_ROWS,
        "num_cpus": NUM_CPUS,
        "urls_per_sec": round(CORPUS_ROWS / headline),
        "dedup_survivors": state.get("dedup_survivors"),
        "dedup_unique_frac": state.get("dedup_unique_frac"),
        "hll_distinct_est": round(state["distinct_est"])
        if "distinct_est" in state else None,
        # VERDICT r4 #7: the scaling claim rides INSIDE the main
        # artifact — latest `bench.py --scaling` result (efficiency +
        # hardware-envelope control), persisted by scaling() to
        # BENCH_SCALING.json and committed, so BENCH_r{N} is
        # self-contained rather than pointing at BASELINE.md prose.
        "scaling": _load_scaling_block(),
    }))
    ray.shutdown()


_SCALING_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_SCALING.json")


def _load_scaling_block():
    try:
        with open(_SCALING_JSON) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _merge_scaling_history(prior: dict, payload: dict) -> dict:
    """Fold the previous BENCH_SCALING content into ``payload`` as a
    "sessions" list (deduped by measured_at) so the artifact carries
    every session of the round, not just whichever epoch ran last."""
    sessions = list(prior.get("sessions", []))
    if "scaling_efficiency" in prior:
        prev = {k: v for k, v in prior.items()
                if k not in ("sessions", "session_efficiencies")}
        if prev.get("measured_at") not in {s.get("measured_at")
                                           for s in sessions}:
            sessions.append(prev)
    sessions.append({k: v for k, v in payload.items()
                     if k not in ("sessions", "session_efficiencies")})
    payload["sessions"] = sessions
    payload["session_efficiencies"] = [s.get("scaling_efficiency")
                                       for s in sessions]
    return payload


def scaling() -> None:
    """N vs 4N CPU scaling (driver criterion; default pair from
    $GRAFT_SCALE_CPUS, "2,8").

    Why not 8 vs 32: this sandbox advertises 32 logical CPUs but a raw
    CPU control (32 parallel numpy matmul processes) shows aggregate
    throughput PEAKS near 16 processes and drops at 32 — i.e. ~10-16
    effective cores.  Beyond the physical envelope no workload can
    show 0.8 efficiency.  The 2→8 pair stays inside the envelope and
    measures OUR pipeline's scaling, not the hypervisor's throttling;
    BASELINE.md records the control experiment and the 8/32 numbers.
    """
    import subprocess

    lo, hi = (int(x) for x in
              os.environ.get("GRAFT_SCALE_CPUS", "2,8").split(","))

    def envelope(nproc: int, secs: int = 12) -> int:
        """Hardware-envelope control (round 4): aggregate matmul
        throughput of nproc INDEPENDENT python processes — what the
        host physically permits at this minute, pipeline-free.  The
        sandbox's effective-core count drifts with co-tenancy (epochs
        observed from ~0.97 down to ~0.6 of linear 2→8), so every
        scaling artifact carries its own envelope: compare the
        pipeline's speedup against the control's, not an ideal 4x."""
        worker = ("import numpy as np, time\n"
                  "a = np.random.default_rng(1).random((1400, 1400))\n"
                  f"t_end = time.time() + {secs}\n"
                  "n = 0\n"
                  "while time.time() < t_end:\n"
                  "    (a @ a).sum(); n += 1\n"
                  "print(n)\n")
        # pin BLAS to one thread per worker — otherwise each matmul
        # process grabs OpenBLAS's default thread count and envelope(2)
        # silently measures 2*T cores, compressing control_speedup
        env = dict(os.environ, OMP_NUM_THREADS="1",
                   OPENBLAS_NUM_THREADS="1", MKL_NUM_THREADS="1")
        ps = [subprocess.Popen([sys.executable, "-c", worker],
                               stdout=subprocess.PIPE, text=True, env=env)
              for _ in range(nproc)]
        total = 0
        for p in ps:
            out = p.communicate()[0].strip()
            if out.isdigit():  # a dead worker must not kill the session
                total += int(out)
        return total
    ensure_corpus(CORPUS_ROWS)  # generate once, outside the timed runs
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "3"))
    # INTERLEAVED levels (round 4): the sandbox drifts — it slowed
    # ~1.6x DURING one round-4 measurement window, and running all
    # lo-cpu sessions before all hi-cpu ones lets a monotone slowdown
    # masquerade as (anti-)scaling.  Alternating lo/hi pairs each run
    # with a same-epoch partner, so the per-level medians compare like
    # with like.  The criterion still measures the HEADLINE pipeline
    # (the e2e webtext job) on the same input at both levels; ±30%
    # single-run noise → median of N per level.  One in-process run
    # per subprocess (GRAFT_BENCH_REPEATS=1): --scaling medians over N
    # FRESH sessions already; letting main() also median internally
    # would cube the runs.
    raw = {lo: [], hi: []}
    control_ratios: list[float] = []

    def measure_control() -> None:
        c_lo, c_hi = envelope(lo), envelope(hi)
        if c_lo > 0 and c_hi > 0:
            control_ratios.append(round(c_hi / c_lo, 3))

    for _ in range(repeats):
        # envelope control before each rep (plus one after the last,
        # below): what speedup the host physically permits per epoch —
        # kept as PER-REP ratios and summarized by median, matching
        # how the pipeline levels themselves are summarized
        measure_control()
        for ncpu in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_REPEATS="1",
                       GRAFT_BENCH_ONLY=os.environ.get("GRAFT_BENCH_ONLY",
                                                       "webtext_e2e"))
            out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 check=True, cwd=os.path.dirname(
                                     os.path.abspath(__file__)))
            raw[ncpu].append(
                json.loads(out.stdout.strip().splitlines()[-1]))
    measure_control()  # trailing bracket after the final rep
    results, all_runs = {}, {}
    for ncpu in (lo, hi):
        runs = sorted(raw[ncpu], key=lambda r: r["value"])
        results[ncpu] = runs[len(runs) // 2]  # median
        all_runs[ncpu] = [r["value"] for r in runs]
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    factor = hi / lo
    ratios = sorted(control_ratios)
    control_speedup = ratios[len(ratios) // 2] if ratios else None
    eff = round((t_lo / t_hi) / factor, 3)
    payload = {
        "cpus": [lo, hi],
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": eff,
        # hardware-envelope control: per-epoch hi/lo matmul-throughput
        # ratios measured before each rep and after the last —
        # summarized by MEDIAN (matching the pipeline statistic); the
        # raw per-epoch ratios expose intra-session weather
        "control_speedup": control_speedup,
        "control_ratios": control_ratios,
        "control_efficiency": round(control_speedup / factor, 3)
        if control_speedup else None,
        "efficiency_vs_envelope": round(
            (t_lo / t_hi) / control_speedup, 3) if control_speedup
        else None,
        f"runs_{lo}": all_runs[lo],
        f"runs_{hi}": all_runs[hi],
        f"urls_per_sec_{lo}": results[lo]["urls_per_sec"],
        f"urls_per_sec_{hi}": results[hi]["urls_per_sec"],
    }
    payload["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(payload))
    # persist so the next plain `bench.py` run embeds it (r4 #7).
    # The file keeps EVERY session of the round under "sessions"
    # (latest fields at top level) — one noisy epoch must not become
    # the only scaling evidence in the artifact, in either direction.
    _merge_scaling_history(_load_scaling_block() or {}, payload)
    try:
        with open(_SCALING_JSON, "w") as f:
            json.dump(payload, f, indent=1)
    except OSError:
        pass


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
