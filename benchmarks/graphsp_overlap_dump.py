#!/usr/bin/env python
"""Structural evidence for the graph-SP ring's compute/transfer overlap.

AOT-compiles the edge-partitioned aggregation (`parallel.graph_shard`)
against a REAL TPU v5e 2x4 topology (``jax.experimental.topologies`` —
no chips needed, the actual XLA:TPU pipeline runs) and inspects the
scheduled while-loop body: the overlap claim holds when the ring's
``ppermute`` is emitted as an async ``collective-permute-start`` BEFORE
the local block-contraction fusion and its matching ``-done`` is only
awaited AFTER it — the ICI transfer of the next feature shard is in
flight underneath the MXU work. Writes the instruction schedule (with
line evidence) to BENCH_GRAPHSP_OVERLAP.json.

A CPU-mesh (8 virtual devices) compile is also analysed for contrast:
XLA:CPU emits the synchronous collective-permute form, which is why the
round-4 artifact could not show the overlap — the TPU pipeline is where
the async split happens.
"""

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

B, L, D = 2, 256, 64
N = 8


def _ring_hlo(mesh):
    from metagenomic_deepfri_tpu.parallel.graph_shard import \
        make_edge_partitioned_aggregate

    fn = make_edge_partitioned_aggregate(mesh, L, D)
    args = (jax.ShapeDtypeStruct((B, L, 3), np.float32),
            jax.ShapeDtypeStruct((B, L), np.float32),
            jax.ShapeDtypeStruct((B,), np.int32),
            jax.ShapeDtypeStruct((B, L, D), np.float32))
    return fn.lower(*args).compile().as_text()


def _loop_body_schedule(hlo: str):
    """Ordered (line_no, kind, snippet) events in the ring-loop body."""
    # the loop body is the computation holding both the ppermute and the
    # bij,bjd->bid block contraction
    best = None
    for m in re.finditer(r"^%?(\S+) \([^\n]*?\) -> [^\n]*? \{\n(.*?)^\}",
                         hlo, re.S | re.M):
        body = m.group(2)
        if "ppermute" in body and "bij,bjd->bid" in body:
            best = (m.group(1), body)
            break
    if best is None:
        return None, []
    name, body = best
    events = []
    for i, ln in enumerate(body.splitlines()):
        ln = ln.strip()
        if re.match(r"%?collective-permute-start", ln):
            events.append((i, "collective-permute-start (ppermute issue)",
                           ln[:140]))
        elif re.match(r"%?collective-permute-done", ln):
            events.append((i, "collective-permute-done (await transfer)",
                           ln[:140]))
        elif "collective-permute" in ln and "done" not in ln \
                and "start" not in ln:
            events.append((i, "collective-permute (sync form)", ln[:140]))
        elif "bij,bjd->bid/dot_general" in ln:
            events.append((i, "block contraction (bij,bjd->bid)", ln[:140]))
    return name, events


def main():
    report = {"program": f"make_edge_partitioned_aggregate(L={L}, D={D}, "
                         f"B={B}) on an {N}-device ring"}

    # --- real TPU pipeline via AOT topology (primary evidence) ---
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x4")
        mesh_devices = np.array(topo.devices).reshape(N)
        from metagenomic_deepfri_tpu.parallel.mesh import MODEL_AXIS

        tpu_hlo = _ring_hlo(Mesh(mesh_devices, (MODEL_AXIS,)))
        name, events = _loop_body_schedule(tpu_hlo)
        kinds = [k for _, k, _ in events]
        starts = [i for i, k in enumerate(kinds) if k.startswith(
            "collective-permute-start")]
        dones = [i for i, k in enumerate(kinds) if k.startswith(
            "collective-permute-done")]
        dots = [i for i, k in enumerate(kinds) if k.startswith(
            "block contraction")]
        overlap = bool(starts and dones and dots
                       and min(starts) < max(dots) < max(dones))
        report["tpu_v5e_2x4"] = {
            "loop_body": name,
            "schedule": kinds,
            "events": [{"line": i, "kind": k, "hlo": s}
                       for i, k, s in events],
            "async_start_before_contraction_done_after": overlap,
            "interpretation": (
                "XLA:TPU issues the ring ppermute as collective-permute-"
                "start, runs the full block-aggregation fusion, and only "
                "then awaits collective-permute-done: the next shard's "
                "ICI transfer rides under the MXU contraction, as the "
                "design claims" if overlap else
                "schedule did not show the async bracket — inspect events"),
        }
    except Exception as exc:  # topology AOT unavailable in some envs
        report["tpu_v5e_2x4"] = {"error": f"{type(exc).__name__}: {exc}"}

    # --- CPU virtual mesh for contrast ---
    from metagenomic_deepfri_tpu.parallel.mesh import MODEL_AXIS

    cpu_hlo = _ring_hlo(Mesh(np.array(jax.devices()[:N]), (MODEL_AXIS,)))
    name, events = _loop_body_schedule(cpu_hlo)
    report["cpu_virtual_mesh"] = {
        "loop_body": name,
        "schedule": [k for _, k, _ in events],
        "note": "XLA:CPU emits the synchronous collective-permute form — "
                "the async split is a TPU-pipeline pass, which is why "
                "overlap evidence requires the AOT TPU compile above",
    }

    out = Path(__file__).resolve().parent.parent / \
        "BENCH_GRAPHSP_OVERLAP.json"
    with open(out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=1)
    summary = {
        "tpu_schedule": report["tpu_v5e_2x4"].get("schedule"),
        "overlap_proven": report["tpu_v5e_2x4"].get(
            "async_start_before_contraction_done_after"),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
