#!/usr/bin/env python
"""Bare two-process socket-shuffle calibration of the one-box ceiling.

The standalone-cluster N→4N pair (scripts/cluster_scaling_bench.py) moves
the blocked engine's partial-rank shuffle between executor JVMs through
loopback sockets on ONE box. Its wall efficiency is therefore bounded by
how well this box's memory system scales K concurrent inter-process
socket streams from K=N to K=4N — a hardware property, not an engine
property. This harness measures exactly that bound, the same way
``ppr_scale_worker``'s bare-process calibration bounds the local[k]
pairs: no Spark, no Arrow, no Python object churn — K sender processes
each push B bytes through a loopback TCP connection to K receiver
processes that read and touch every byte (one memcpy, as a shuffle fetch
does), at K = N and K = 4N.

Reported: aggregate bytes/s at each K, and
``pair_ceiling = (agg_4N / agg_N) / 4`` — the best wall efficiency ANY
shuffle-dominated job can show between the same process counts on this
box. The cluster pair's harness efficiency is its measured wall
efficiency divided by this ceiling.

Env: CALIB_N (default 2 → pair 2 vs 8), CALIB_BYTES per stream (default
2 GiB), CALIB_TRIALS (default 3). Prints ONE JSON line and writes
BENCH/socket_calibration.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import socket
import time

CHUNK = 1 << 20  # 1 MiB sends — netty-ish transfer granularity


def _receiver(port_q, nbytes: int, done_q) -> None:
    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port_q.put(srv.getsockname()[1])
    conn, _ = srv.accept()
    buf = bytearray(CHUNK)
    view = memoryview(buf)
    got = 0
    touch = 0
    while got < nbytes:
        n = conn.recv_into(view)
        if n == 0:
            break
        # touch the bytes (a shuffle fetch copies into the read buffer)
        touch ^= buf[0] ^ buf[n - 1]
        got += n
    conn.close()
    srv.close()
    done_q.put((got, touch))


def _sender(port: int, nbytes: int) -> None:
    s = socket.socket()
    s.connect(("127.0.0.1", port))
    payload = bytes(CHUNK)
    sent = 0
    while sent < nbytes:
        s.sendall(payload)
        sent += CHUNK
    s.close()


def run_level(k: int, nbytes: int) -> float:
    """Aggregate bytes/s moving k concurrent streams of nbytes each."""
    ctx = mp.get_context("spawn")
    port_q = ctx.Queue()
    done_q = ctx.Queue()
    receivers = [
        ctx.Process(target=_receiver, args=(port_q, nbytes, done_q))
        for _ in range(k)
    ]
    for r in receivers:
        r.start()
    ports = [port_q.get() for _ in range(k)]
    t0 = time.time()
    senders = [
        ctx.Process(target=_sender, args=(p, nbytes)) for p in ports
    ]
    for s in senders:
        s.start()
    total = 0
    for _ in range(k):
        got, _t = done_q.get()
        total += got
    wall = time.time() - t0
    for p in senders + receivers:
        p.join(timeout=30)
    return total / wall


def _cpu_ticks() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:9]]
    return vals[7], sum(vals)


def main() -> None:
    n_low = int(os.environ.get("CALIB_N", "2"))
    n_high = 4 * n_low
    nbytes = int(os.environ.get("CALIB_BYTES", str(2 << 30)))
    trials = int(os.environ.get("CALIB_TRIALS", "3"))
    out = {"pair": [n_low, n_high], "bytes_per_stream": nbytes, "chunk": CHUNK}
    for k in (n_low, n_high):
        rates, steals = [], []
        for _ in range(trials):
            s0, c0 = _cpu_ticks()
            rates.append(run_level(k, nbytes))
            s1, c1 = _cpu_ticks()
            steals.append(round(100 * (s1 - s0) / max(1, c1 - c0), 1))
        out[str(k)] = {
            "agg_bytes_per_sec": [round(r, 1) for r in rates],
            "best": round(max(rates), 1),
            "trial_steal_pct": steals,
        }
    out["pair_ceiling"] = round(
        (out[str(n_high)]["best"] / out[str(n_low)]["best"]) / (n_high / n_low), 3
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    line = json.dumps(out)
    with open(os.path.join(repo, "BENCH", "socket_calibration.json"), "w") as fh:
        fh.write(line + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
