"""N→4N scaling experiment (north rule: efficiency ≥ 0.8).

Sandbox protocol (BASELINE.md): the identical job on identical input at
local[8] (N) vs local[32] (4N) on one 32-core host, median-of-3 timed runs
(bench.py) after a full warmup pass.  local[2] is captured as an extra low
point but is NOT the baseline: each Python-UDF task occupies up to ~2 cores
(JVM Arrow thread + Python worker), so very low local[k] borrows idle host
cores and inflates the per-slot rate.

Results → BENCH.md.  Usage: python tools/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_BENCH_DOCS=str(N_DOCS),
    )
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    results = {c: run(c) for c in (2, 8, 32)}
    dps = {c: r["extract_docs_per_sec"] for c, r in results.items()}
    eff_2_8 = round(dps[8] / dps[2] / 4.0, 3)
    eff_8_32 = round(dps[32] / dps[8] / 4.0, 3)

    lines = [
        "# BENCH — measured in-sandbox performance\n",
        f"Input: deterministic synthetic corpus ({N_DOCS} pages, seed 42, page "
        "classes incl. 1000-span skew and >1 MiB oversized pages), materialized "
        f"to parquet once (untimed) + driver tables at `{SF_DIR}`.\n",
        "Methodology: steady-state — a full warmup pass (JIT, codegen cache, "
        "Python workers) is excluded, mirroring the reference's warmup-skipped "
        "timing (det_model/inference.py:117-121); sink = noop (full computation, "
        "no disk noise); pipeline metric is median-of-3. Host: one 32-core VM.\n",
        "## Scaling (north rule: efficiency ≥ 0.8 from N to 4N)\n",
        "Protocol: identical job, identical input, local[8] (N) vs local[32] "
        "(4N). local[2] is an extra low point, not the baseline: each "
        "Python-UDF task occupies up to ~2 cores (JVM Arrow thread + Python "
        "worker), so very low local[k] borrows idle host cores and inflates "
        "the per-slot rate.\n",
        "| parallelism | extraction docs/sec | pipeline sec | headline total sec |",
        "| --- | --- | --- | --- |",
    ]
    for c in (2, 8, 32):
        r = results[c]
        label = {2: "local[2] (extra low point)", 8: "local[8] (N)", 32: "local[32] (4N)"}[c]
        lines.append(
            f"| {label} | {dps[c]} | {r['queries']['pipeline_extract']} | {r['value']} |"
        )
    lines += [
        f"\n**Scaling efficiency N→4N (local[8]→local[32]): {eff_8_32}**",
        f"\nExtra: local[2]→local[8] step: {eff_2_8} (inflated-baseline regime, see above)\n",
        "## Per-query seconds\n",
        "| query | local[2] | local[8] | local[32] |",
        "| --- | --- | --- | --- |",
    ]
    for q in results[8]["queries"]:
        lines.append(
            f"| {q} | {results[2]['queries'][q]} | {results[8]['queries'][q]} | {results[32]['queries'][q]} |"
        )
    lines.append("\nRaw JSON:\n")
    lines.append("```")
    for c in (2, 8, 32):
        lines.append(json.dumps(results[c]))
    lines.append("```")
    (ROOT / "BENCH.md").write_text("\n".join(lines) + "\n")
    print(json.dumps({"dps": dps, "eff_2_8": eff_2_8, "eff_8_32": eff_8_32}))


if __name__ == "__main__":
    main()
