from transmvsnet_tpu.eval.dtu_eval import (
    evaluate_point_cloud,
    evaluate_dtu_scan,
    evaluate_dtu,
    reduce_points,
    nn_distances,
)
