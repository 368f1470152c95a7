"""Auxiliary subsystem tests: checkpoint/resume, serving predictors, vectorize,
mesh construction, provenance, output encoders."""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import pixray_tpu as pixray
from tests.test_e2e import tiny_settings


class TestCheckpointResume:
    def test_roundtrip(self, tmp_path):
        from pixray_tpu.engine.checkpoint import restore_session, save_session

        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, iterations=6))
        settings = pixray.apply_settings()
        engine = pixray.do_init(settings)
        engine.train(0)
        engine.train(1)
        engine.cur_iteration = 2
        ckpt = str(tmp_path / "sess.ckpt")
        save_session(ckpt, engine)
        z_saved = np.asarray(engine.z).copy()

        # fresh engine, same config → restore
        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, iterations=6))
        settings2 = pixray.apply_settings()
        engine2 = pixray.do_init(settings2)
        it = restore_session(ckpt, engine2)
        assert it == 2
        np.testing.assert_array_equal(np.asarray(engine2.z), z_saved)

    def test_cross_mode_blocked_save_single_resume(self, tmp_path):
        """Save under blocked dispatch, resume with single-step dispatch."""
        from pixray_tpu.engine.checkpoint import restore_session, save_session

        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, iterations=8, steps_per_call=4))
        engine = pixray.do_init(pixray.apply_settings())
        for i in range(4):
            engine.train(i)
        engine.cur_iteration = 4
        ckpt = str(tmp_path / "cross.ckpt")
        save_session(ckpt, engine)
        z_saved = np.asarray(engine.z).copy()

        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, iterations=8, steps_per_call=1))
        engine2 = pixray.do_init(pixray.apply_settings())
        it = restore_session(ckpt, engine2)
        assert it == 4
        np.testing.assert_array_equal(np.asarray(engine2.z), z_saved)
        engine2.train(4)  # one single-step dispatch on restored state
        assert not np.array_equal(np.asarray(engine2.z), z_saved)

    def test_schema_and_drawer_validation(self, tmp_path):
        from pixray_tpu.engine import checkpoint as ckpt_mod
        from pixray_tpu.engine.checkpoint import (
            read_manifest,
            restore_session,
            save_session,
        )

        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, iterations=4))
        engine = pixray.do_init(pixray.apply_settings())
        path = str(tmp_path / "v.ckpt")
        save_session(path, engine)

        state = read_manifest(path)
        assert state["schema_version"] == ckpt_mod.SCHEMA_VERSION
        assert state["jax_version"]
        assert state["drawer"] == type(engine.drawer).__name__

        def tamper(**edits):
            with np.load(path, allow_pickle=False) as z:
                arrays = {name: z[name] for name in z.files}
            manifest = dict(state, **edits)
            arrays["manifest"] = ckpt_mod._manifest_bytes(manifest)
            np.savez(open(path, "wb"), **arrays)

        tamper(schema_version=-1)
        with pytest.raises(ValueError, match="schema mismatch"):
            restore_session(path, engine)

        tamper(drawer="SomethingElse")
        with pytest.raises(ValueError, match="drawer"):
            restore_session(path, engine)

    def test_restore_never_unpickles(self, tmp_path):
        """A malicious pickle (or pickled npz) fails to parse instead of
        executing: restore_session loads with allow_pickle=False only."""
        import pickle

        from pixray_tpu.engine.checkpoint import restore_session

        class Boom:
            def __reduce__(self):
                return (os.system, ("touch " + str(tmp_path / "pwned"),))

        evil = tmp_path / "evil.ckpt"
        with open(evil, "wb") as f:
            pickle.dump({"schema_version": 3, "payload": Boom()}, f)
        with pytest.raises(Exception):
            restore_session(str(evil), engine=None)
        assert not (tmp_path / "pwned").exists()

        # an npz whose arrays are object-dtype pickles is also refused
        evil2 = tmp_path / "evil2.ckpt"
        np.savez(open(evil2, "wb"),
                 manifest=np.array({"schema_version": 3}, dtype=object))
        with pytest.raises(Exception):
            restore_session(str(evil2), engine=None)
        assert not (tmp_path / "pwned").exists()

    def test_checkpoint_every_setting(self, tmp_path):
        pixray.reset_settings()
        pixray.add_settings(**tiny_settings(tmp_path, checkpoint_every="2i", iterations=4))
        settings = pixray.apply_settings()
        assert settings.checkpoint_every == 2


class TestServing:
    def test_streaming_predictor(self, tmp_path, monkeypatch):
        """PixrayApi product streams ≥2 partial results then completes."""
        import pixray_tpu.serve.predictors as P

        cogs = tmp_path / "cogs"
        cogs.mkdir()
        base = tiny_settings(tmp_path, iterations=4, display_every=2, save_every=2)
        import yaml

        (cogs / "pixrayapi.yaml").write_text(yaml.dump(base))
        monkeypatch.setattr(P, "COGS_DIR", str(cogs))

        predictor = P.PixrayApi()
        predictor.setup()
        results = list(predictor.predict(settings="\n"))
        assert len(results) >= 2
        for p in results:
            assert os.path.exists(p)
            Image.open(p)  # decodable

    def test_products_registry(self):
        from pixray_tpu.serve.predictors import PRODUCTS

        assert set(PRODUCTS) >= {
            "text2image", "pixray_vqgan", "pixray_pixel", "text2pixel",
            "pixrayraw", "pixrayapi", "tiler", "pixray_vdiff", "8bidg", "genesis",
        }

    def test_cogs_yamls_parse(self):
        import yaml

        cogs_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cogs")
        names = [n for n in os.listdir(cogs_dir) if n.endswith(".yaml")]
        assert len(names) >= 12
        for name in names:
            with open(os.path.join(cogs_dir, name)) as f:
                assert isinstance(yaml.safe_load(f), dict)


class TestVectorize:
    def test_avg_diff(self, tmp_path):
        from pixray_tpu.tools.vectorize import main

        rng = np.random.default_rng(0)
        t1 = {"TinyTest": rng.random((4, 32)).tolist()}
        t2 = {"TinyTest": (rng.random((4, 32)) + 1.0).tolist()}
        f1, f2 = tmp_path / "a.json", tmp_path / "b.json"
        f1.write_text(json.dumps(t1))
        f2.write_text(json.dumps(t2))
        out = tmp_path / "diff.json"
        main(["--avg-diff", f"{f1},{f2}", "--outfile", str(out)])
        result = json.loads(out.read_text())
        vec = np.array(result["TinyTest"])
        assert vec.shape == (1, 32)
        expected = np.mean(t2["TinyTest"], axis=0) - np.mean(t1["TinyTest"], axis=0)
        np.testing.assert_allclose(vec[0], expected, rtol=1e-6)

    def test_svm_diff(self, tmp_path):
        from pixray_tpu.tools.vectorize import main

        rng = np.random.default_rng(0)
        t1 = {"m": (rng.random((8, 16)) - 2).tolist()}
        t2 = {"m": (rng.random((8, 16)) + 2).tolist()}
        f1, f2 = tmp_path / "a.json", tmp_path / "b.json"
        f1.write_text(json.dumps(t1))
        f2.write_text(json.dumps(t2))
        out = tmp_path / "svm.json"
        main(["--svm-diff", f"{f1},{f2}", "--outfile", str(out)])
        vec = np.array(json.loads(out.read_text())["m"])
        assert vec.shape == (1, 16)
        assert np.isfinite(vec).all()

    def test_spew_vectors(self, tmp_path):
        from pixray_tpu.tools import vectorize as V

        img = tmp_path / "img1.png"
        Image.new("RGB", (40, 40), (200, 10, 10)).save(img)
        args = SimpleNamespace(models="TinyTest", inputs=str(tmp_path / "*.png"),
                               outfile=str(tmp_path / "vecs.json"), avg_diff=None, svm_diff=None)
        V.init(args)
        V.spew_vectors(args, args.inputs, args.outfile)
        table = json.loads((tmp_path / "vecs.json").read_text())
        assert np.array(table["TinyTest"]).shape == (1, 32)


class TestMesh:
    def test_build_mesh_cpu(self):
        import jax

        from pixray_tpu.parallel.mesh import build_mesh, pad_cuts_for_mesh

        devices = jax.devices("cpu")
        if len(devices) < 8:
            pytest.skip("needs 8 virtual cpu devices")
        mesh = build_mesh("8", devices=devices)
        assert dict(mesh.shape) == {"data": 8, "model": 1}
        assert pad_cuts_for_mesh(30, mesh) == 32

    def test_single_device_none(self):
        import jax

        from pixray_tpu.parallel.mesh import build_mesh

        assert build_mesh("1", devices=jax.devices("cpu")[:1]) is None


class TestVideoEncoders:
    def test_gif_assembly(self, tmp_path):
        from pixray_tpu.io.output import make_gif

        anim = tmp_path / "anim"
        anim.mkdir()
        for i in range(3):
            Image.new("RGB", (16, 16), (i * 40, 0, 0)).save(anim / f"f{i}.png")
        gif = make_gif(str(anim))
        assert os.path.exists(gif)
        assert Image.open(gif).is_animated

    def test_mp4_or_gif_fallback(self, tmp_path):
        from pixray_tpu.io.output import encode_frames_to_mp4

        frames = [Image.new("RGB", (16, 16), (0, g, 0)) for g in (0, 100, 200)]
        out = str(tmp_path / "video.mp4")
        encode_frames_to_mp4(frames, out, fps=10)
        assert os.path.exists(out) or os.path.exists(str(tmp_path / "video.gif"))


class TestProfiling:
    def test_phase_timer(self):
        from pixray_tpu.engine.profiling import PhaseTimer

        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        assert t.counts["a"] == 2
        assert "a:" in t.report()


class TestHttpServing:
    def test_multipart_streaming(self, tmp_path, monkeypatch):
        import http.client
        import threading
        import yaml
        from http.server import HTTPServer

        import pixray_tpu.serve.predictors as P
        from pixray_tpu.serve.http import PredictionHandler
        from tests.test_e2e import tiny_settings

        cogs = tmp_path / "cogs"
        cogs.mkdir()
        (cogs / "pixrayapi.yaml").write_text(
            yaml.dump(tiny_settings(tmp_path, iterations=2, display_every=1, save_every=1))
        )
        monkeypatch.setattr(P, "COGS_DIR", str(cogs))

        server = HTTPServer(("127.0.0.1", 0), PredictionHandler)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("GET", "/products")
            assert b"pixrayapi" in conn.getresponse().read()

            conn.request("POST", "/predictions/pixrayapi", body=b"{}")
            resp = conn.getresponse()
            assert resp.status == 200
            assert "multipart" in resp.getheader("Content-Type", "")
            body = resp.read()
            assert body.count(b"Content-Type: image/png") >= 1
            assert b"\x89PNG" in body

            conn.request("GET", "/queue")
            q = conn.getresponse().read()
            assert b"pending" in q and b"capacity" in q
        finally:
            server.shutdown()

    def test_bounded_queue_backpressure(self):
        """The device-owning worker's queue is bounded: submissions beyond
        capacity are rejected (the handler turns that into 503+Retry-After)."""
        from pixray_tpu.serve.http import _Job, _Worker

        w = _Worker(max_pending=1)  # not started: jobs stay queued
        assert w.submit(_Job("text2image", {})) is True
        assert w.submit(_Job("text2image", {})) is False

    def test_job_deadline_unwedges_queue(self, monkeypatch):
        """A render stuck past the per-job deadline is cancelled (client gets
        a timeout error part) and the worker keeps draining later jobs."""
        import time

        from pixray_tpu.serve import http as H

        class StuckPredictor:
            def setup(self):
                pass

            def predict(self, **kw):
                time.sleep(30)  # wedged inside one device call, never yields
                yield "never"

        class QuickPredictor:
            def setup(self):
                pass

            def predict(self, **kw):
                yield from []

        monkeypatch.setitem(H.PRODUCTS, "stuck", StuckPredictor)
        monkeypatch.setitem(H.PRODUCTS, "quick", QuickPredictor)
        w = H._Worker(max_pending=2, job_timeout=0.2)
        w.start()
        j1, j2 = H._Job("stuck", {}), H._Job("quick", {})
        assert w.submit(j1) and w.submit(j2)
        path, err = j1.frames.get(timeout=10)
        assert path is None and "deadline" in err
        path, err = j2.frames.get(timeout=10)  # queue kept draining
        assert path is None and err is None

    def test_slow_job_backpressure_http(self, monkeypatch):
        """While a slow render occupies the worker and the queue is full,
        the next HTTP client gets 503 + Retry-After (then the slow job is
        released and queued clients complete)."""
        import http.client
        import threading
        from http.server import ThreadingHTTPServer

        from pixray_tpu.serve import http as H

        release = threading.Event()

        class SlowPredictor:
            def setup(self):
                pass

            def predict(self, **kw):
                release.wait(30)
                yield from []

        monkeypatch.setitem(H.PRODUCTS, "slow", SlowPredictor)
        w = H._Worker(max_pending=1, job_timeout=60)
        w.start()
        monkeypatch.setattr(H, "get_worker", lambda: w)

        server = ThreadingHTTPServer(("127.0.0.1", 0), H.PredictionHandler)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            def post():
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
                c.request("POST", "/predictions/slow", body=b"{}")
                return c

            c1 = post()  # dequeued by the worker, running (blocked on release)
            import time

            time.sleep(0.3)  # let the worker dequeue c1's job
            c2 = post()  # sits in the bounded queue (capacity 1)
            time.sleep(0.1)
            c3 = post()  # queue full → backpressure
            r3 = c3.getresponse()
            assert r3.status == 503
            assert r3.getheader("Retry-After")

            release.set()
            assert c1.getresponse().status == 200
            assert c2.getresponse().status == 200
        finally:
            server.shutdown()
