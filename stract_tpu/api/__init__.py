from .server import build_app, run_api
