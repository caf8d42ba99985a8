"""Multi-host runtime: jax.distributed bring-up, liveness, graceful drain.

The reference is single-box (SURVEY.md §2.3); these are the TPU-pod
equivalents the charter requires (§5.3/§5.8): initialize the multi-host
runtime, heartbeat files over shared storage or sockets for liveness, and a
drain hook so a host can finish in-flight sequences before leaving.

Single-host callers can ignore this module entirely.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from pathlib import Path
from typing import Callable, Optional

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Bring up jax.distributed (DCN) — no-op when single-process.

    Env fallbacks: PIE_COORDINATOR, PIE_NUM_PROCESSES, PIE_PROCESS_ID.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("PIE_COORDINATOR")
    if coordinator_address is None:
        return False
    num_processes = int(
        num_processes or os.environ.get("PIE_NUM_PROCESSES", "1")
    )
    process_id = int(process_id or os.environ.get("PIE_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed up: process %d/%d via %s",
        process_id, num_processes, coordinator_address,
    )
    return True


class Heartbeat:
    """File-based liveness beacon + peer monitor (DCN-adjacent shared
    storage). A host that misses ``timeout`` seconds of beats is reported
    dead so its queued requests can be re-routed (charter §5.3: multi-host
    liveness + request re-queue)."""

    def __init__(
        self,
        directory: str | Path,
        host_id: str,
        interval: float = 5.0,
        timeout: float = 30.0,
        on_peer_death: Optional[Callable[[str], None]] = None,
    ):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.host_id = host_id
        self.interval = interval
        self.timeout = timeout
        self.on_peer_death = on_peer_death
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._dead: set[str] = set()

    def _path(self, host: str) -> Path:
        return self.dir / f"{host}.heartbeat"

    def beat(self):
        self._path(self.host_id).write_text(
            json.dumps({"ts": time.time(), "host": self.host_id})
        )

    def peers(self) -> dict[str, float]:
        out = {}
        for p in self.dir.glob("*.heartbeat"):
            host = p.stem
            if host == self.host_id:
                continue
            try:
                out[host] = json.loads(p.read_text())["ts"]
            except Exception:
                continue
        return out

    def dead_peers(self) -> list[str]:
        now = time.time()
        return [h for h, ts in self.peers().items() if now - ts > self.timeout]

    def _loop(self):
        while not self._stop.is_set():
            self.beat()
            for host in self.dead_peers():
                if host not in self._dead:
                    self._dead.add(host)
                    logger.warning("peer %s missed heartbeats", host)
                    if self.on_peer_death:
                        try:
                            self.on_peer_death(host)
                        except Exception:
                            logger.exception("on_peer_death failed")
            self._stop.wait(self.interval)

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._loop, name="pie-heartbeat", daemon=True
            )
            self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)
            self._thread = None
        try:
            self._path(self.host_id).unlink(missing_ok=True)
        except OSError:
            pass


def drain(scheduler, timeout: float = 120.0) -> bool:
    """Stop admitting work and run the scheduler until in-flight sequences
    finish (graceful pool drain, charter §5.3). Returns False on timeout."""
    deadline = time.time() + timeout
    requeued = list(scheduler.waiting)
    scheduler.waiting.clear()
    while scheduler.running and time.time() < deadline:
        scheduler.step()
    for seq in requeued:
        seq.status = type(seq.status).WAITING
    return not scheduler.running
