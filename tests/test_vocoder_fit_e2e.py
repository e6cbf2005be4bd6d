"""CLI-level `vocoder-fit` → native checkpoint → get_vocoder round trip."""
import os

import numpy as np
import pytest
import yaml

from tests.test_data import corpus  # fixture reuse


@pytest.mark.slow
def test_vocoder_fit_and_native_load(corpus, tmp_path):
    root, datasets, phonemizer_cfg = corpus
    out_dir = str(tmp_path / "voc")
    data_cfg = {
        "data": {"init_args": {
            "batchsize": 2,
            "trainset_config": {"datasets": datasets},
            "sampling_rate": 22050, "filter_length": 1024,
            "hop_length": 256, "win_length": 1024,
            "n_mel_channels": 80, "mel_fmax": 8000.0,
            "symbol_set": "radmmm_phonemizer_marker_segregated",
            "cleaners": ["basic_cleaners"], "g2p_type": "phonemizer",
            "phonemizer_cfg": phonemizer_cfg,
            "speaker_stats_path": str(root / "stats.json"),
        }}}
    voc_cfg = {
        "vocoder": {
            "generator": {"upsample_rates": [8, 8, 4],
                          "upsample_kernel_sizes": [16, 16, 8],
                          "upsample_initial_channel": 32,
                          "resblock_kernel_sizes": [3],
                          "resblock_dilation_sizes": [[1, 3]],
                          "n_mel_channels": 80},
            "train": {"segment_size": 2048, "mel_fmax_loss": None},
            "output_directory": out_dir,
            "max_steps": 3, "log_interval": 1, "iters_per_checkpoint": 3,
        }}
    dpath, vpath = tmp_path / "d.yaml", tmp_path / "v.yaml"
    dpath.write_text(yaml.safe_dump(data_cfg))
    vpath.write_text(yaml.safe_dump(voc_cfg))

    from radmmm_tpu.training.cli import main
    main(["vocoder-fit", "-c", str(dpath), "-c", str(vpath)])

    assert os.path.exists(os.path.join(out_dir, "generator_config.json"))
    assert os.path.isdir(os.path.join(out_dir, "ckpt"))

    # the predict/validation path consumes the run dir directly
    from radmmm_tpu.vocoder.utils import get_vocoder, get_audio_for_mels
    voc_fn, denoiser = get_vocoder("hifigan",
                                   vocoder_checkpoint_path=out_dir)
    assert voc_fn is not None and denoiser is not None
    mel = np.random.RandomState(0).randn(2, 32, 80).astype(np.float32)
    audio = np.asarray(get_audio_for_mels(mel, "hifigan", voc_fn, denoiser))
    assert audio.shape == (2, 32 * 256) and np.isfinite(audio).all()
