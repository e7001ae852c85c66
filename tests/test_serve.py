"""Serving stack integration test: controller + two workers over real HTTP
(register, heartbeat, dispatch, streaming generate)."""

import json
import threading
import time
import urllib.request

import pytest

from microscopiq_tpu.serve.controller import serve_controller
from microscopiq_tpu.serve.worker import ModelWorker, serve_worker


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def stack():
    ctrl_srv = serve_controller("127.0.0.1", 0)
    ctrl_port = ctrl_srv.server_address[1]
    threading.Thread(target=ctrl_srv.serve_forever, daemon=True).start()
    ctrl = f"http://127.0.0.1:{ctrl_port}"

    def gen(prompt, max_new_tokens, temperature):
        for i in range(3):
            yield f"{prompt}|tok{i}"

    workers = []
    for _ in range(2):
        w_srv = serve_worker(
            ModelWorker(ctrl, "PENDING", ["test-model"], gen,
                        register=False), "127.0.0.1", 0)
        port = w_srv.server_address[1]
        w_srv.worker.worker_addr = f"http://127.0.0.1:{port}"
        threading.Thread(target=w_srv.serve_forever, daemon=True).start()
        w_srv.worker.register_to_controller()
        workers.append(w_srv)
    yield ctrl, workers
    ctrl_srv.shutdown()
    for w in workers:
        w.shutdown()


def test_register_and_list(stack):
    ctrl, _ = stack
    models = _post(ctrl + "/list_models", {})["models"]
    assert models == ["test-model"]


def test_dispatch_and_generate(stack):
    ctrl, workers = stack
    addr = _post(ctrl + "/get_worker_address", {"model": "test-model"})
    assert addr["address"].startswith("http://127.0.0.1:")
    req = urllib.request.Request(
        addr["address"] + "/worker_generate_stream",
        data=json.dumps({"prompt": "hi", "max_new_tokens": 4}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        chunks = [json.loads(c) for c in r.read().split(b"\0") if c]
    assert chunks[-1]["text"] == "hi|tok2"
    assert all(c["error_code"] == 0 for c in chunks)


def test_shortest_queue_balances(stack):
    ctrl, _ = stack
    addrs = {_post(ctrl + "/get_worker_address",
                   {"model": "test-model"})["address"] for _ in range(6)}
    assert len(addrs) == 2  # both workers get traffic


def test_heartbeat(stack):
    ctrl, workers = stack
    w = workers[0].worker
    r = _post(ctrl + "/receive_heart_beat",
              {"worker_name": w.worker_addr, "queue_length": 3})
    assert r["exist"]
    r = _post(ctrl + "/receive_heart_beat",
              {"worker_name": "http://nope", "queue_length": 0})
    assert not r["exist"]


def test_unknown_model(stack):
    ctrl, _ = stack
    addr = _post(ctrl + "/get_worker_address", {"model": "missing"})
    assert addr["address"] == ""


# ---------------------------------------------------------------------------
# Client utilities (serve/cli.py): register / test_message / chat loop
# ---------------------------------------------------------------------------
def test_cli_register_and_list(stack):
    from microscopiq_tpu.serve import cli

    ctrl, workers = stack
    addr = workers[0].worker.worker_addr
    assert cli.register_worker(ctrl, addr)["success"] is True
    assert cli.list_models(ctrl) == ["test-model"]
    assert cli.get_worker(ctrl, "test-model").startswith("http://")


def test_cli_test_message(stack):
    import io

    from microscopiq_tpu.serve import cli

    ctrl, _ = stack
    out = io.StringIO()
    text = cli.test_message(ctrl, message="hi", max_new_tokens=8, out=out)
    assert text == "hi|tok2"            # fixture streams 3 chunks
    assert "hi|tok0" in out.getvalue()


def test_cli_chat_loop_streams(stack):
    import io

    from microscopiq_tpu.serve import cli

    ctrl, _ = stack
    out = io.StringIO()
    cli.chat_loop(ctrl, model="test-model", max_new_tokens=4,
                  stdin=io.StringIO("hello\n"), stdout=out)
    assert "hello|tok2" in out.getvalue()
