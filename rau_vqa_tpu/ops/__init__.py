from rau_vqa_tpu.ops.rau_hops import rau_hops_reference, rau_hops_pallas  # noqa: F401
