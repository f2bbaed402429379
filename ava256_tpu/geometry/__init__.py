from ava256_tpu.geometry.obj import load_obj
from ava256_tpu.geometry.krt import load_camera_calibration
from ava256_tpu.geometry.ply import parse_ply_vertices
from ava256_tpu.geometry.uv import create_uv_baridx, make_closest_uv_barys

__all__ = [
    "load_obj",
    "load_camera_calibration",
    "parse_ply_vertices",
    "create_uv_baridx",
    "make_closest_uv_barys",
]
