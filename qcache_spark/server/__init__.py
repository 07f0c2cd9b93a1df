from .app import make_server, serve_forever_in_thread
from .statistics import Statistics

__all__ = ["make_server", "serve_forever_in_thread", "Statistics"]
