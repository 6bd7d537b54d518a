from fastselect_spark.multimodal.binary import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_and_featurize,
    deterministic_fake_decoder,
    sample_frames,
    synthesize_media_table,
    unavailable_decoder,
)
