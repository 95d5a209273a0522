"""SIBR live-viewer protocol (utils/network_gui.py) — loopback-socket
coverage (VERDICT r4 missing #4): wire format, matrix conventions, and the
cli/train --gui integration (connect mid-training, receive a rendered
frame, clean disconnect).

Protocol parity: gaussian_renderer/network_gui.py:26-60 — the viewer sends
[4-byte LE length][json] camera messages and receives raw RGB bytes followed
by [4-byte LE length][verify string].
"""
import json
import socket
import threading

import numpy as np


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _camera_msg(width=24, height=24, keep_alive=True, train=True):
    view = np.eye(4, dtype=np.float32)
    view[3, :3] = [0.0, 0.0, 3.0]       # row-vector convention translation
    vp = view.copy()
    return {
        "resolution_x": width, "resolution_y": height,
        "fov_x": 0.8, "fov_y": 0.8,
        "z_near": 0.01, "z_far": 100.0,
        "train": train, "keep_alive": keep_alive,
        "scaling_modifier": 1.0,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": vp.reshape(-1).tolist(),
    }


def _send_msg(sock, msg: dict) -> None:
    data = json.dumps(msg).encode("utf-8")
    sock.sendall(len(data).to_bytes(4, "little"))
    sock.sendall(data)


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server disconnected early"
        buf += chunk
    return buf


class TestProtocol:
    def test_camera_roundtrip_and_image_reply(self):
        from mygauhuman_tpu.utils.network_gui import NetworkGUI

        port = _free_port()
        gui = NetworkGUI("127.0.0.1", port)
        try:
            client = socket.create_connection(("127.0.0.1", port), timeout=5)
            assert gui.try_connect()

            _send_msg(client, _camera_msg(width=8, height=6))
            cam, do_train, keep_alive, smod = gui.receive()
            assert (cam.width, cam.height) == (8, 6)
            assert do_train is True and keep_alive is True and smod == 1.0
            # row-vector view matrix with columns 1,2 sign-flipped, then
            # transposed into our column-vector w2c
            # (network_gui.py:68-81; reference :40-47)
            expect = np.eye(4, dtype=np.float32)
            expect[3, :3] = [0.0, 0.0, 3.0]
            expect[:, 1] *= -1
            expect[:, 2] *= -1
            np.testing.assert_allclose(cam.w2c, expect.T)

            img = np.zeros((6, 8, 3), np.float32)
            img[2, 3] = [1.0, 0.5, 0.0]
            gui.send_image(img, "training_ok")
            raw = _recv_exact(client, 6 * 8 * 3)
            arr = np.frombuffer(raw, np.uint8).reshape(6, 8, 3)
            assert tuple(arr[2, 3]) == (255, 127, 0)
            vlen = int.from_bytes(_recv_exact(client, 4), "little")
            assert _recv_exact(client, vlen) == b"training_ok"

            # zero-resolution message -> no camera (viewer idle poll)
            _send_msg(client, _camera_msg(width=0, height=0))
            cam2, _, _, _ = gui.receive()
            assert cam2 is None

            # disconnect is surfaced as ConnectionError, not a hang
            client.close()
            try:
                gui.read()
                raise AssertionError("expected ConnectionError")
            except ConnectionError:
                pass
            gui.drop_connection()
        finally:
            gui.close()

    def test_try_connect_nonblocking(self):
        from mygauhuman_tpu.utils.network_gui import NetworkGUI

        gui = NetworkGUI("127.0.0.1", _free_port())
        try:
            assert gui.try_connect() is False   # nobody there; returns now
        finally:
            gui.close()


class TestTrainingIntegration:
    def test_viewer_during_cli_training(self, tmp_path):
        """cli/train --gui end-to-end: a viewer connects while the loop
        runs, sends one camera (keep_alive=False), and must get back a
        well-formed RGB frame of ITS requested resolution plus the verify
        path string; training then finishes cleanly (train.py:180-193)."""
        from mygauhuman_tpu.cli.train import main as train_main

        port = _free_port()
        out = str(tmp_path / "exp_gui")
        result = {}
        err = []

        def run():
            try:
                result.update(train_main([
                    "--synthetic", "--synthetic_size", "32",
                    "--synthetic_verts", "120",
                    "--iterations", "40",
                    "--test_iterations", "40", "--save_iterations", "40",
                    "--model_path", out, "--skip_galleries",
                    "--disable_lpips",
                    "--gui", "--gui_port", str(port),
                ]))
            except Exception as e:          # surface thread failures
                err.append(e)

        t = threading.Thread(target=run)
        t.start()
        try:
            client = None
            for _ in range(200):            # wait for the listener
                try:
                    client = socket.create_connection(
                        ("127.0.0.1", port), timeout=0.2)
                    break
                except OSError:
                    if not t.is_alive():
                        break
                    import time
                    time.sleep(0.1)
            assert client is not None, (err, result)

            W = H = 20
            _send_msg(client, _camera_msg(width=W, height=H,
                                          keep_alive=False))
            client.settimeout(120)
            raw = _recv_exact(client, H * W * 3)
            assert len(raw) == H * W * 3
            vlen = int.from_bytes(_recv_exact(client, 4), "little")
            verify = _recv_exact(client, vlen).decode()
            assert verify == out
            client.close()
        finally:
            t.join(timeout=600)
        assert not t.is_alive()
        assert not err, err
        assert np.isfinite(result["final_loss"])
