"""``python -m pie_tpu.server`` entry point (reference server/__main__.py:6-14)."""

from aiohttp import web

from pie_tpu.server.app import create_app
from pie_tpu.server.config import get_settings


def main():
    settings = get_settings()
    app = create_app(settings=settings)
    web.run_app(app, host=settings.host, port=settings.port)


if __name__ == "__main__":
    main()
