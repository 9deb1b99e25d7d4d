from transmvsnet_tpu.fusion.ply import read_ply, write_ply
from transmvsnet_tpu.fusion.dynamic import fuse_scan, fuse_scans
