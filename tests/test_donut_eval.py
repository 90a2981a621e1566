"""Donut baseline eval task, exercised OFFLINE (VERDICT r1 item 8).

The reference uses ``task_donut_eval_ocr`` as its external correctness anchor
(``/root/reference/src/pixparse/task/task_donut_eval_ocr.py:44-178``,
README.md:44) but it normally needs hub weights. Here a tiny
``VisionEncoderDecoderModel`` + ``DonutProcessor`` are constructed locally
from configs (no network) and injected through the ``_load_hf`` hook, so the
full step -> generate -> strip -> CER/WER path runs in CI.
"""

import numpy as np
import pytest
from PIL import Image

from pixparse_tpu.parallel.mesh import MeshEnv
from pixparse_tpu.task import TaskDonutEvalOCR, TaskDonutEvalOCRCfg
from pixparse_tpu.tokenizers import TokenizerCfg, TokenizerHF

torch = pytest.importorskip("torch")


def _tiny_donut():
    from transformers import (
        BartConfig,
        DonutImageProcessor,
        DonutProcessor,
        ViTConfig,
        VisionEncoderDecoderConfig,
        VisionEncoderDecoderModel,
    )

    tok = TokenizerHF(TokenizerCfg(name="pixparse_bytelevel")).trunk
    enc_cfg = ViTConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=16, num_channels=3,
    )
    dec_cfg = BartConfig(
        vocab_size=len(tok), d_model=32, decoder_layers=1, encoder_layers=1,
        decoder_attention_heads=2, encoder_attention_heads=2,
        decoder_ffn_dim=64, encoder_ffn_dim=64, max_position_embeddings=24,
    )
    cfg = VisionEncoderDecoderConfig.from_encoder_decoder_configs(enc_cfg, dec_cfg)
    torch.manual_seed(0)
    model = VisionEncoderDecoderModel(cfg)
    model.config.decoder_start_token_id = tok.bos_token_id
    model.config.pad_token_id = tok.pad_token_id
    processor = DonutProcessor(
        image_processor=DonutImageProcessor(
            size={"height": 32, "width": 32}, do_align_long_axis=False
        ),
        tokenizer=tok,
    )
    return processor, model


def test_donut_eval_ocr_offline_end_to_end(monkeypatch):
    processor, model = _tiny_donut()
    monkeypatch.setattr(
        TaskDonutEvalOCR, "_load_hf", staticmethod(lambda name: (processor, model))
    )
    env = MeshEnv.initialize()
    task = TaskDonutEvalOCR(TaskDonutEvalOCRCfg(), env, None)

    # raw-text annotation path (reference keeps the unt tokenized page text)
    anno = {"pages": [{"text": ["hello world", "second line"]}]}
    pre = task.anno_preprocess_eval(anno)
    assert pre["text"] == ["hello world\nsecond line"]

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (40, 30, 3), np.uint8), "RGB")
    sample = {"image": [img, img], "text": ["hello world", "quick brown fox"]}
    metrics = task.step(sample)
    assert {"cer", "wer"} <= set(metrics)
    assert np.isfinite(metrics["cer"]) and np.isfinite(metrics["wer"])
    # a random tiny model can't read; error rates must reflect that
    assert metrics["cer"] > 0

    avg = task.average_metrics({0: metrics, 1: metrics})
    assert avg["cer"] == pytest.approx(metrics["cer"])

    # the batched-tuple sample layout used by the wds loader path
    metrics2 = task.step(([img], ["hello world"]))
    assert "cer" in metrics2
