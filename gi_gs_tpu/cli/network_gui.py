"""SIBR live-viewer socket protocol — equivalent of the reference
`gaussian_renderer/network_gui.py` (present but never called by the
fork's train.py; kept for interface parity with the 3DGS viewer).

Message framing: 4-byte little-endian length + JSON request from the
viewer; response is raw RGB bytes followed by a length-prefixed verify
string.
"""
from __future__ import annotations

import json
import socket
from typing import Dict, Optional, Tuple

import numpy as np

from ..scene.cameras import Camera

host = "127.0.0.1"
port = 6009

conn = None
addr = None
listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)


def init(wish_host: str = "127.0.0.1", wish_port: int = 6009) -> None:
    global host, port, listener
    host, port = wish_host, wish_port
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect() -> None:
    global conn, addr
    try:
        conn, addr = listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def read() -> Dict:
    n = int.from_bytes(conn.recv(4), "little")
    return json.loads(conn.recv(n).decode("utf-8"))


def send(image_bytes: Optional[bytes], verify: str) -> None:
    if image_bytes is not None:
        conn.sendall(image_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive() -> Tuple[Optional[Camera], Optional[bool], Optional[bool],
                       Optional[bool], Optional[bool], Optional[float]]:
    """Parse one viewer request into a Camera + control flags (ref
    network_gui.receive:63-117). The viewer sends OpenGL-flipped
    view/projection matrices (columns 1, 2 negated)."""
    import jax.numpy as jnp
    msg = read()
    width, height = msg["resolution_x"], msg["resolution_y"]
    if width == 0 or height == 0:
        return None, None, None, None, None, None
    w2c_t = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
    w2c_t[:, 1] *= -1
    w2c_t[:, 2] *= -1
    fullproj_t = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
    fullproj_t[:, 1] *= -1
    # The viewer uses the transposed (row-vector) convention.
    w2c = w2c_t.T
    full_proj = fullproj_t.T
    import math
    fovy, fovx = msg["fov_y"], msg["fov_x"]
    cam = Camera(
        w2c=jnp.asarray(w2c), full_proj=jnp.asarray(full_proj),
        cam_pos=jnp.asarray(np.linalg.inv(w2c)[:3, 3]),
        tanfovx=jnp.float32(math.tan(fovx * 0.5)),
        tanfovy=jnp.float32(math.tan(fovy * 0.5)),
        fx=jnp.float32(width / (2 * math.tan(fovx * 0.5))),
        fy=jnp.float32(height / (2 * math.tan(fovy * 0.5))),
        width=int(width), height=int(height))
    return (cam, bool(msg["train"]), bool(msg["shs_python"]),
            bool(msg["rot_scale_python"]), bool(msg["keep_alive"]),
            float(msg["scaling_modifier"]))


def image_to_bytes(image) -> bytes:
    """[3, H, W] float render -> viewer byte stream."""
    arr = np.asarray(image)
    arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return arr.transpose(1, 2, 0).tobytes()
