# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
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
