"""Multi-host bring-up: jax.distributed + global mesh + failure detection.

The reference is single-process/single-node (SURVEY §2.3); scale-out is new
design per the build plan (§7 M5). Topology model:

  * intra-host chips connect over ICI — the "model" (TP) axis lives here so
    weight-sharded collectives (all-gather of channel slices) ride ICI;
  * hosts connect over DCN — the "data" (DP) axis spans hosts, so the only
    cross-host traffic is request scatter/gather, not per-layer collectives.

Failure detection (SURVEY §5: reference has none; we add the TPU-native
equivalent): a heartbeat thread per host writes liveness into a coordination
key-value namespace via jax's distributed client; `check_peers` reports
missing hosts so a supervisor can restart the job from the last weights
snapshot (weights are stateless for inference — restart is just re-init).
"""

from __future__ import annotations

import threading
import time
from typing import Optional, Tuple

import jax
import numpy as np

from ..utils.log import logger
from .mesh import make_mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize wrapper; no-op when single-process."""
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def global_mesh(tp: Optional[int] = None) -> "jax.sharding.Mesh":
    """Global (data, model) mesh: "model" never crosses host boundaries so TP
    collectives stay on ICI; "data" spans hosts over DCN."""
    local = jax.local_device_count()
    total = jax.device_count()
    if tp is None:
        tp = local  # TP within the host by default
    if local % tp != 0:
        raise ValueError(f"tp={tp} must divide local device count {local}")
    dp = total // tp
    # order devices host-major so the model axis is intra-host
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return make_mesh(devs, shape=(dp, tp))


def host_local_batch_to_global(x: np.ndarray, mesh) -> jax.Array:
    """Assemble a DP-sharded global batch from each host's local requests
    (continuous batching across hosts: every host contributes its queue's
    rows; DCN moves nothing — each shard stays on its host's chips)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


class Heartbeat:
    """Per-host liveness for failure detection (no reference analog —
    SURVEY §5 row 'Failure detection').

    Each process's beat thread publishes `/tt/heartbeat/<pid>/<ns>` keys into
    the jax.distributed coordination KV store; `check_peers` lists the whole
    `/tt/heartbeat/` directory and reports any expected process whose newest
    key is older than `timeout_s` (or absent entirely). A dead process stops
    publishing, so survivors detect it within one timeout window — exercised
    by killing a worker in tests/test_multiprocess.py."""

    def __init__(self, interval_s: float = 5.0, timeout_s: float = 15.0):
        self.interval_s = interval_s
        self.timeout_s = timeout_s
        self._last_seen = {}
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._client = getattr(
            getattr(jax._src, "distributed", None), "global_state", None
        )
        # wall-clock offset baseline so peers' time_ns keys compare against
        # our clock (hosts in one job are NTP-close; timeout_s >> skew)
        self._t0_ns = time.time_ns()

    def start(self):
        self._running = True
        self._thread = threading.Thread(target=self._beat, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread:
            self._thread.join(timeout=2)

    def _kv(self):
        client = getattr(self._client, "client", None) if self._client else None
        return client

    def _beat(self):
        pid = jax.process_index()
        while self._running:
            client = self._kv()
            if client is not None:
                try:
                    client.key_value_set(
                        f"/tt/heartbeat/{pid}/{time.time_ns()}", "1"
                    )
                except Exception:
                    pass
            self._last_seen[pid] = time.time()
            time.sleep(self.interval_s)

    def peer_last_seen(self) -> dict:
        """Newest heartbeat timestamp (seconds, this host's clock domain)
        per process id, read from the coordination KV store."""
        client = self._kv()
        seen = dict(self._last_seen)
        if client is None:
            return seen
        try:
            entries = client.key_value_dir_get("/tt/heartbeat/")
        except Exception:
            return seen
        for key, _val in entries:
            # key layout: /tt/heartbeat/<pid>/<time_ns>  (dir_get may return
            # either the full path or the path relative to the prefix)
            parts = [p for p in str(key).split("/") if p]
            if len(parts) < 2:
                continue
            try:
                pid = int(parts[-2])
                ts = int(parts[-1]) / 1e9
            except ValueError:
                continue
            if ts > seen.get(pid, 0.0):
                seen[pid] = ts
        return seen

    def check_peers(self) -> Tuple[bool, list]:
        """Returns (healthy, missing_process_ids). Single-process: always
        healthy. Multi-process: every expected process id (0..process_count)
        must have a KV heartbeat newer than timeout_s; missing/stale peers
        are reported for supervisor restart."""
        if jax.process_count() == 1:
            return True, []
        now = time.time()
        seen = self.peer_last_seen()
        missing = [
            p
            for p in range(jax.process_count())
            if now - seen.get(p, 0.0) > self.timeout_s
        ]
        return not missing, missing
