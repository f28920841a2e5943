from lavila_tpu.models.zoo import available_models, build_model  # noqa: F401
