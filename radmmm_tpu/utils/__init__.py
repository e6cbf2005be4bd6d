from radmmm_tpu.utils.masking import (
    mask_from_lengths,
    SeqLens,
)
