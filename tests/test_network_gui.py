"""Remote-viewer socket protocol loopback test."""
import json
import socket
import struct
import threading

import numpy as np

from materialrefgs_tpu.utils.network_gui import NetworkGUI


def test_gui_loopback():
    gui = NetworkGUI(port=0)  # ephemeral port
    port = gui.listener.getsockname()[1]

    results = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        # receive render_items
        n = struct.unpack("I", s.recv(4))[0]
        results["items"] = json.loads(s.recv(n).decode())
        # send a camera message
        wv = np.eye(4).flatten().tolist()
        msg = {
            "resolution_x": 8, "resolution_y": 8, "train": 1, "fov_y": 0.8,
            "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0, "keep_alive": 1,
            "scaling_modifier": 1.0, "view_matrix": wv,
            "view_projection_matrix": wv, "render_mode": "RGB",
        }
        raw = json.dumps(msg).encode()
        s.sendall(len(raw).to_bytes(4, "little") + raw)
        # receive image + verify + metrics
        img = b""
        while len(img) < 8 * 8 * 3:
            img += s.recv(8 * 8 * 3 - len(img))
        vn = int.from_bytes(s.recv(4), "little")
        results["verify"] = s.recv(vn).decode()
        mn = struct.unpack("I", s.recv(4))[0]
        results["metrics"] = json.loads(s.recv(mn).decode())
        s.close()

    t = threading.Thread(target=client)
    t.start()
    for _ in range(100):
        if gui.try_connect(["RGB", "Depth"]):
            break
    cam, do_training, keep_alive, sm, mode = gui.receive()
    assert cam.width == 8 and do_training and keep_alive
    gui.send(np.full((8, 8, 3), 0.5), "ok", {"psnr": 30.0})
    t.join(timeout=5)
    gui.close()
    assert results["items"] == ["RGB", "Depth"]
    assert results["verify"] == "ok"
    assert results["metrics"]["psnr"] == 30.0
