from sfd2_tpu.sfm.map_index import MapIndex
