from gen6d_tpu.pipeline.estimator import Gen6DEstimator

name2estimator = {'gen6d': Gen6DEstimator}
