"""Serving stack: controller/worker HTTP protocol, client utilities, and
the continuous-batching engine.

Import side-effect-free; heavy deps (jax, models) load only when the
engine is used.
"""

from .cli import (chat_loop, get_worker, list_models, register_worker,
                  stream_generate, test_message)
from .controller import Controller, serve_controller
from .openai_api import OpenAIGateway, serve_openai
from .web_server import WebServer, serve_web
from .worker import ModelWorker, serve_worker

__all__ = [
    "BatchEngine", "Request", "engine_generate_stream_fn",
    "Controller", "serve_controller", "ModelWorker", "serve_worker",
    "OpenAIGateway", "serve_openai", "WebServer", "serve_web",
    "chat_loop", "get_worker", "list_models", "register_worker",
    "stream_generate", "test_message",
]


def __getattr__(name):
    # lazy: engine pulls in jax/flax
    if name in ("BatchEngine", "Request", "engine_generate_stream_fn"):
        from . import engine

        return getattr(engine, name)
    raise AttributeError(name)
