"""Load-test the sampling server with N concurrent clients.

Measures multi-client end-to-end throughput (conformations/sec over HTTP)
against a running ``esmdiff-serve`` — the evidence for the two-phase device
locking in cli/serve.py (trunk sampling of request B overlaps VQ decode /
formatting of request A).  Run the server first, e.g.:

  esmdiff-serve --mode ddpm --model_scale full --warmup_lengths 58 &
  python scripts/serve_load.py --clients 4 --requests 3 --num_samples 100

Prints one JSON line with per-client latencies and aggregate conf/s.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request

BPTI_SEQ = ("RPDFCLEPPYTGPCKARIIRYFYNAKAGLCQTFVYGGCRAKRNNFKSAEDCMRTC"
            "GGA")


def one_request(url: str, payload: dict, out: list, idx: int):
    t0 = time.time()
    body = json.dumps(payload).encode()
    req = urllib.request.Request(
        url + "/sample", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        r = json.loads(resp.read())
    out.append({
        "client": idx,
        "seq_len": len(payload["sequence"]),
        "wall_sec": round(time.time() - t0, 3),
        "sampling_sec": r.get("sampling_sec"),
        "total_sec": r.get("total_sec"),
        "n_models": r["pdb"].count("MODEL") if "pdb" in r
        else len(r.get("tokens", [])),
    })


def _mixed_sequences(lengths: list[int]) -> list[str]:
    """Deterministic pseudo-protein sequences at the requested lengths —
    mixed-length traffic exercises the coalescer's same-bucket grouping
    boundary (requests in different length buckets cannot co-batch)."""
    alphabet = "ACDEFGHIKLMNPQRSTVWY"
    return ["".join(alphabet[(7 * i + 3 * n) % 20] for i in range(n))
            for n in lengths]


def _pct(xs: list[float], q: float) -> float:
    xs = sorted(xs)
    k = max(0, min(len(xs) - 1, int(round(q * (len(xs) - 1)))))
    return xs[k]


def main(argv=None):
    p = argparse.ArgumentParser(description="Concurrent serve load test.")
    p.add_argument("--url", type=str, default="http://127.0.0.1:8000")
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--requests", type=int, default=2,
                   help="Sequential requests per client.")
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--mode", type=str, default="ddpm")
    p.add_argument("--sequence", type=str, default=BPTI_SEQ)
    p.add_argument("--mixed_lengths", type=str, default=None,
                   help="Comma-separated residue counts, e.g. 58,120,250: "
                        "clients round-robin over pseudo-sequences of these "
                        "lengths (mixed-length traffic; VERDICT round 3 "
                        "item 9).  Overrides --sequence.")
    p.add_argument("--format", type=str, default="pdb")
    args = p.parse_args(argv)

    if args.mixed_lengths:
        seqs = _mixed_sequences(
            [int(x) for x in args.mixed_lengths.split(",")])
    else:
        seqs = [args.sequence]

    def payload_for(k: int) -> dict:
        d = {"sequence": seqs[k % len(seqs)],
             "num_samples": args.num_samples,
             "mode": args.mode, "format": args.format}
        if args.num_steps is not None:
            d["num_steps"] = args.num_steps
        return d

    # warm pass per distinct length so compile/executable-load noise stays
    # out of the measurement
    warm: list = []
    for k in range(len(seqs)):
        one_request(args.url, {**payload_for(k), "seed": 999}, warm, -1)

    results: list = []
    t0 = time.time()

    def client(idx: int):
        for r in range(args.requests):
            k = idx * args.requests + r
            one_request(args.url, {**payload_for(k), "seed": idx * 1000 + r},
                        results, idx)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    n_requests = args.clients * args.requests
    n_conf = sum(r["n_models"] for r in results)
    lat = [r["wall_sec"] for r in results]
    by_len = {}
    for L in sorted({r["seq_len"] for r in results}):
        ls = [r["wall_sec"] for r in results if r["seq_len"] == L]
        by_len[str(L)] = {"n": len(ls), "p50_sec": round(_pct(ls, 0.5), 3),
                          "p95_sec": round(_pct(ls, 0.95), 3),
                          "max_sec": round(max(ls), 3)}
    print(json.dumps({
        "clients": args.clients,
        "requests": n_requests,
        "num_samples": args.num_samples,
        "mixed_lengths": args.mixed_lengths,
        "total_wall_sec": round(wall, 3),
        "conf_per_sec_aggregate": round(n_conf / wall, 2),
        "latency_p50_sec": round(_pct(lat, 0.5), 3),
        "latency_p95_sec": round(_pct(lat, 0.95), 3),
        "per_length": by_len,
        "warm_single_request_sec": [w["wall_sec"] for w in warm],
        "per_request": sorted(results, key=lambda r: r["client"]),
    }))


if __name__ == "__main__":
    main()
