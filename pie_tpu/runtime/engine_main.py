"""Standalone engine process: the TPU-native analog of the reference's
``pie_engine`` executable (reference src/main.cpp:55-131) — request slots
arrive over the POSIX shm ring (C++ IpcReader thread, futex doorbell),
the C++ scheduler drives the jitted device programs, and tokens stream
back through the response ring. Frontends attach with
:class:`pie_tpu.runtime.ipc.IpcFrontend` (no JAX required in the
frontend process).

Run:  python -m pie_tpu.runtime.engine_main \
          --model-path /path/to/model --channel /pie_engine

Graceful shutdown on SIGINT/SIGTERM (reference main.cpp:22-25 signal
handling + shm unlink): stops admitting, finishes draining via the
service shutdown, unlinks the shm segment.
"""

from __future__ import annotations

import argparse
import logging
import signal
import threading

logger = logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--channel", default="/pie_engine",
                    help="shm channel name (frontends attach to this)")
    ap.add_argument("--num-lanes", type=int, default=8)
    ap.add_argument("--num-pages", type=int, default=1024)
    ap.add_argument("--max-pages-per-seq", type=int, default=64)
    ap.add_argument("--kv-quantized", action="store_true")
    ap.add_argument("--request-slots", type=int, default=256)
    ap.add_argument("--log-level", default="INFO")
    args = ap.parse_args(argv)
    logging.basicConfig(level=args.log_level)

    from pie_tpu.engine.scheduler import PagedEngine
    from pie_tpu.models.loader import load_model
    from pie_tpu.runtime.ipc import IpcEngineService
    from pie_tpu.runtime.native_scheduler import NativeScheduler

    logger.info("loading model from %s", args.model_path)
    model, params = load_model(args.model_path)
    engine = PagedEngine(
        model, params,
        num_lanes=args.num_lanes,
        num_pages=args.num_pages,
        max_pages_per_seq=args.max_pages_per_seq,
        kv_quantized=args.kv_quantized,
    )
    scheduler = NativeScheduler(engine)
    service = IpcEngineService(
        scheduler, args.channel, request_slots=args.request_slots
    )

    stop = threading.Event()

    def _graceful(signum, frame):
        logger.info("signal %d: draining and shutting down", signum)
        stop.set()

    signal.signal(signal.SIGINT, _graceful)
    signal.signal(signal.SIGTERM, _graceful)

    logger.info(
        "engine up: channel=%s lanes=%d pages=%d",
        args.channel, args.num_lanes, args.num_pages,
    )
    try:
        service.serve_forever(should_stop=stop.is_set)
    finally:
        service.shutdown()
        logger.info("engine down")


if __name__ == "__main__":
    main()
