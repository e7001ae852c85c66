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


# ---------------------------------------------------------------------------
# Web chat front-end (serve/web_server.py, gradio_web_server.py parity)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def web(stack, tmp_path_factory):
    from microscopiq_tpu.serve.web_server import serve_web

    ctrl, _ = stack
    log_dir = tmp_path_factory.mktemp("convlog")
    srv = serve_web(ctrl, "127.0.0.1", 0, str(log_dir))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv.app
    srv.shutdown()


def test_web_page_and_models(web):
    url, app = web
    with urllib.request.urlopen(url + "/", timeout=5) as r:
        page = r.read().decode()
    assert "microscopiq_tpu chat" in page and "/api/chat" in page
    models = _post(url + "/api/models", {})["models"]
    assert models == ["test-model"]


def test_web_chat_streams_and_logs(web):
    url, app = web
    req = urllib.request.Request(
        url + "/api/chat",
        data=json.dumps({"model": "test-model",
                         "messages": [{"role": "user",
                                       "content": "hello"}],
                         "max_new_tokens": 4}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        lines = [json.loads(l) for l in r.read().splitlines() if l]
    # cumulative texts; prompt was built through the conv template
    assert len(lines) == 3
    assert lines[-1]["text"].endswith("|tok2")
    assert "USER: hello" in lines[-1]["text"]
    # conv log written (vote_last_response / chat logging parity)
    with open(app.conv_log_filename()) as f:
        recs = [json.loads(l) for l in f]
    assert recs[-1]["type"] == "chat" and recs[-1]["model"] == "test-model"


def test_web_vote_logged(web):
    url, app = web
    r = _post(url + "/api/vote", {"type": "upvote", "model": "test-model",
                                  "state": [{"role": "user",
                                             "content": "x"}]})
    assert r["ok"]
    with open(app.conv_log_filename()) as f:
        recs = [json.loads(l) for l in f]
    assert recs[-1]["type"] == "upvote" and "tstamp" in recs[-1]


def test_web_unknown_model_yields_error(web):
    url, _ = web
    req = urllib.request.Request(
        url + "/api/chat",
        data=json.dumps({"model": "missing",
                         "messages": [{"role": "user",
                                       "content": "x"}]}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        lines = [json.loads(l) for l in r.read().splitlines() if l]
    assert "error" in lines[0]


# ---------------------------------------------------------------------------
# OpenAI-compatible gateway (serve/openai_api.py, sglang_worker parity)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def oai(stack):
    from microscopiq_tpu.serve.openai_api import serve_openai

    ctrl, _ = stack

    # a worker whose stream is truly cumulative (append-only), like the
    # real engine's generate_stream_fn
    def cum_gen(prompt, max_new_tokens, temperature):
        text = ""
        for i in range(3):
            text += f" w{i}"
            yield text

    w_srv = serve_worker(ModelWorker(ctrl, "PENDING", ["cum-model"],
                                     cum_gen, register=False),
                         "127.0.0.1", 0)
    w_srv.worker.worker_addr = \
        f"http://127.0.0.1:{w_srv.server_address[1]}"
    threading.Thread(target=w_srv.serve_forever, daemon=True).start()
    w_srv.worker.register_to_controller()

    srv = serve_openai(ctrl, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    w_srv.shutdown()


def test_openai_models(oai):
    with urllib.request.urlopen(oai + "/v1/models", timeout=5) as r:
        body = json.loads(r.read())
    assert body["object"] == "list"
    assert [m["id"] for m in body["data"]] == ["cum-model", "test-model"]


def test_openai_chat_completion(oai):
    body = _post(oai + "/v1/chat/completions",
                 {"model": "test-model", "max_tokens": 8,
                  "messages": [{"role": "system", "content": "Be nice."},
                               {"role": "user", "content": "hi"}]})
    assert body["object"] == "chat.completion"
    msg = body["choices"][0]["message"]
    assert msg["role"] == "assistant"
    # the echo worker returns the prompt: system + template + user turn
    assert "Be nice." in msg["content"] and "USER: hi" in msg["content"]
    assert body["usage"]["total_tokens"] == (
        body["usage"]["prompt_tokens"] + body["usage"]["completion_tokens"])


def test_openai_text_completion(oai):
    body = _post(oai + "/v1/completions",
                 {"model": "test-model", "prompt": "raw prompt",
                  "max_tokens": 4})
    assert body["object"] == "text_completion"
    assert body["choices"][0]["text"] == "raw prompt|tok2"


def test_openai_streaming_sse(oai):
    req = urllib.request.Request(
        oai + "/v1/chat/completions",
        data=json.dumps({"model": "cum-model", "stream": True,
                         "messages": [{"role": "user",
                                       "content": "go"}]}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        raw = r.read().decode()
    events = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    parsed = [json.loads(e) for e in events[:-1]]
    assert parsed[0]["choices"][0]["delta"] == {"role": "assistant"}
    # deltas reassemble the cumulative worker stream
    text = "".join(p["choices"][0]["delta"].get("content", "")
                   for p in parsed)
    assert text == " w0 w1 w2"
    assert parsed[-1]["choices"][0]["finish_reason"] == "stop"


def test_openai_missing_model_404(oai):
    req = urllib.request.Request(
        oai + "/v1/chat/completions",
        data=json.dumps({"model": "missing",
                         "messages": [{"role": "user",
                                       "content": "x"}]}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
        assert json.loads(e.read())["error"]["type"] == "model_not_found"
