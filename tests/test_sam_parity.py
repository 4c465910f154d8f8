"""SAM numeric parity vs the PyTorch reference (VERDICT r2 item 7 / weak #5).

Imports reference-random-init state dicts into our SAM modules (explicit
leaf-by-leaf mapping — the SAM trees are small) and compares outputs:

  * MaskDecoder + TwoWayTransformer: mask logits + IoU predictions
  * PromptEncoder: sparse point/box embeddings + dense mask embedding
  * ImageEncoderViT (tiny config): final 256-d embedding map

Reference modules: ultralytics/models/sam/modules/{decoders.py:11,
transformer.py:13, encoders.py:154 PromptEncoder, encoders.py ImageEncoderViT}.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _t2n(t):
    return t.detach().cpu().numpy()


def _lin(sd, key):
    """torch Linear -> our [in, out] matrix + bias."""
    out = {"w": _t2n(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        out["b"] = _t2n(sd[key + ".bias"])
    return out


def _ln(sd, key):
    return {"scale": _t2n(sd[key + ".weight"]), "bias": _t2n(sd[key + ".bias"])}


def _conv(sd, key):
    out = {"w": _t2n(sd[key + ".weight"]).transpose(2, 3, 1, 0)}  # OIHW->HWIO
    if key + ".bias" in sd:
        out["b"] = _t2n(sd[key + ".bias"])
    return out


def _attn(sd, key):
    return {"q": _lin(sd, key + ".q_proj"), "k": _lin(sd, key + ".k_proj"),
            "v": _lin(sd, key + ".v_proj"), "o": _lin(sd, key + ".out_proj")}


def test_mask_decoder_parity(torch_reference):
    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics.models.sam.modules.decoders import MaskDecoder as TorchDecoder
    from ultralytics.models.sam.modules.transformer import TwoWayTransformer

    from yolo_master_tpu.models.sam import MaskDecoder
    from yolo_master_tpu.nn.module import Context

    D, NH, DEPTH = 64, 4, 2
    torch.manual_seed(0)
    td = TorchDecoder(
        transformer_dim=D,
        transformer=TwoWayTransformer(depth=DEPTH, embedding_dim=D, mlp_dim=128, num_heads=NH),
        num_multimask_outputs=3,
    ).eval()
    sd = td.state_dict()

    jd = MaskDecoder(dim=D, num_heads=NH, depth=DEPTH).finalize("dec")
    # our _TwoWayBlock mlp_dim is fixed at 2048 in __init__; rebuild with 128
    jd = MaskDecoder.__new__(MaskDecoder)
    from yolo_master_tpu.models.sam import _CrossAttn, _HyperMLP, _TwoWayBlock
    from yolo_master_tpu.nn.layers import LayerNorm
    from yolo_master_tpu.nn.module import Module, ModuleList

    Module.__init__(jd)
    jd.dim = D
    jd.num_masks = 4
    jd.blocks = ModuleList([_TwoWayBlock(D, NH, 128, skip_first_pe=i == 0) for i in range(DEPTH)])
    jd.final_t2i = _CrossAttn(D, NH)
    jd.final_norm = LayerNorm(D)
    jd.ups_ln = LayerNorm(D // 4, eps=1e-6)
    jd.hyper = ModuleList([_HyperMLP(D, D, D // 8) for _ in range(4)])
    jd.iou_head = _HyperMLP(D, 256, 4)
    jd.finalize("dec")

    p = jd.init(jax.random.PRNGKey(0))
    p["iou_token"] = _t2n(sd["iou_token.weight"])
    p["mask_tokens"] = _t2n(sd["mask_tokens.weight"])
    # torch ConvTranspose2d [in, out, kh, kw] == jax conv_transpose with the
    # SPATIALLY FLIPPED [kh, kw, in, out] kernel (verified empirically)
    p["upconv1"] = _t2n(sd["output_upscaling.0.weight"])[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
    p["upconv2"] = _t2n(sd["output_upscaling.3.weight"])[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
    p["upconv1_b"] = _t2n(sd["output_upscaling.0.bias"])
    p["upconv2_b"] = _t2n(sd["output_upscaling.3.bias"])
    p["ups_ln"] = _ln(sd, "output_upscaling.1")
    for i in range(DEPTH):
        t = f"transformer.layers.{i}"
        b = p["blocks"][str(i)]
        b["self_attn"] = _attn(sd, f"{t}.self_attn")
        b["cross_t2i"] = _attn(sd, f"{t}.cross_attn_token_to_image")
        b["cross_i2t"] = _attn(sd, f"{t}.cross_attn_image_to_token")
        b["mlp"] = {"fc1": _lin(sd, f"{t}.mlp.lin1"), "fc2": _lin(sd, f"{t}.mlp.lin2")}
        for n in (1, 2, 3, 4):
            b[f"norm{n}"] = _ln(sd, f"{t}.norm{n}")
    p["final_t2i"] = _attn(sd, "transformer.final_attn_token_to_image")
    p["final_norm"] = _ln(sd, "transformer.norm_final_attn")
    for i in range(4):
        p["hyper"][str(i)] = {"layers": {str(j): _lin(sd, f"output_hypernetworks_mlps.{i}.layers.{j}") for j in range(3)}}
    p["iou_head"] = {"layers": {str(j): _lin(sd, f"iou_prediction_head.layers.{j}") for j in range(3)}}

    rng = np.random.default_rng(0)
    # the reference decoder repeat-interleaves a single image embedding over
    # the prompt batch (decoders.py:140); keep B=1 so both sides agree
    B, h, w, S = 1, 8, 8, 3
    img_emb = rng.standard_normal((B, h, w, D)).astype(np.float32)
    img_pe = rng.standard_normal((h, w, D)).astype(np.float32)
    sparse = rng.standard_normal((B, S, D)).astype(np.float32)
    dense = rng.standard_normal((B, h, w, D)).astype(np.float32)

    with torch.no_grad():
        t_masks, t_iou = td.predict_masks(
            torch.from_numpy(img_emb.transpose(0, 3, 1, 2)),
            torch.from_numpy(img_pe.transpose(2, 0, 1))[None],
            torch.from_numpy(sparse),
            torch.from_numpy(dense.transpose(0, 3, 1, 2)),
        )

    masks, iou = jd(p, jnp.asarray(img_emb), jnp.asarray(img_pe), jnp.asarray(sparse), jnp.asarray(dense),
                    Context(training=False))
    m_err = np.abs(np.asarray(masks) - _t2n(t_masks)).max()
    i_err = np.abs(np.asarray(iou) - _t2n(t_iou)).max()
    assert m_err < 2e-4, f"mask logits mismatch: {m_err}"
    assert i_err < 2e-5, f"iou mismatch: {i_err}"


def test_prompt_encoder_parity(torch_reference):
    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics.models.sam.modules.encoders import PromptEncoder as TorchPE

    from yolo_master_tpu.models.sam import PromptEncoder
    from yolo_master_tpu.nn.module import Context

    D, GRID, IMG = 64, 8, 128
    torch.manual_seed(1)
    tp = TorchPE(embed_dim=D, image_embedding_size=(GRID, GRID), input_image_size=(IMG, IMG),
                 mask_in_chans=16).eval()
    sd = tp.state_dict()

    jp_mod = PromptEncoder(embed_dim=D, image_embedding_size=(GRID, GRID)).finalize("pe")
    p = jp_mod.init(jax.random.PRNGKey(0))
    p["pe_gaussian"] = _t2n(sd["pe_layer.positional_encoding_gaussian_matrix"])
    for i, name in enumerate(["pt_neg", "pt_pos", "box_tl", "box_br"]):
        p[name] = _t2n(sd[f"point_embeddings.{i}.weight"])[0]
    p["not_a_point"] = _t2n(sd["not_a_point_embed.weight"])[0]
    p["no_mask"] = _t2n(sd["no_mask_embed.weight"])[0]
    for i, tk in enumerate(["0", "3", "6"]):
        p["mask_down"][str(i)] = _conv(sd, f"mask_downscaling.{tk}")
    p["mask_norms"]["0"] = _ln(sd, "mask_downscaling.1")
    p["mask_norms"]["1"] = _ln(sd, "mask_downscaling.4")

    rng = np.random.default_rng(2)
    B, N = 2, 3
    pts01 = rng.uniform(0.1, 0.9, (B, N, 2)).astype(np.float32)
    labels = np.array([[1, 0, -1], [1, 1, 0]], np.int32)
    boxes01 = np.sort(rng.uniform(0.1, 0.9, (B, 2, 2)).astype(np.float32), axis=1)

    # torch takes pixel coords; forward does (x+0.5)/size before the PE
    t_pts = torch.from_numpy(pts01 * IMG - 0.5)
    t_boxes = torch.from_numpy((boxes01 * IMG - 0.5).reshape(B, 4))
    with torch.no_grad():
        t_sparse, t_dense = tp(points=(t_pts, torch.from_numpy(labels)), boxes=t_boxes, masks=None)

    sparse, dense = jp_mod(p, Context(training=False), points=jnp.asarray(pts01),
                           labels=jnp.asarray(labels), boxes=jnp.asarray(boxes01), batch=B)
    s_err = np.abs(np.asarray(sparse) - _t2n(t_sparse)).max()
    d_err = np.abs(np.asarray(dense).transpose(0, 3, 1, 2) - _t2n(t_dense)).max()
    assert s_err < 1e-5, f"sparse embedding mismatch: {s_err}"
    assert d_err < 1e-5, f"dense (no-mask) embedding mismatch: {d_err}"

    # dense mask-prompt path
    mask_in = rng.standard_normal((B, 1, 4 * GRID, 4 * GRID)).astype(np.float32)
    with torch.no_grad():
        _, t_dense_m = tp(points=None, boxes=None, masks=torch.from_numpy(mask_in))
    _, dense_m = jp_mod(p, Context(training=False), masks=jnp.asarray(mask_in.transpose(0, 2, 3, 1)), batch=B)
    dm_err = np.abs(np.asarray(dense_m).transpose(0, 3, 1, 2) - _t2n(t_dense_m)).max()
    assert dm_err < 1e-4, f"dense (mask) embedding mismatch: {dm_err}"

    # dense positional encoding used by the decoder
    t_pe_grid = tp.get_dense_pe()
    j_pe_grid = jp_mod.dense_pe(p)
    pe_err = np.abs(np.asarray(j_pe_grid).transpose(2, 0, 1) - _t2n(t_pe_grid)[0]).max()
    assert pe_err < 1e-5, f"dense PE mismatch: {pe_err}"


def test_image_encoder_vit_parity(torch_reference):
    import jax
    import jax.numpy as jnp
    import torch

    from ultralytics.models.sam.modules.encoders import ImageEncoderViT as TorchViT

    from yolo_master_tpu.models.sam import ImageEncoderViT
    from yolo_master_tpu.nn.module import Context

    IMG, PATCH, DIM, DEPTH, NH = 64, 16, 64, 2, 2
    torch.manual_seed(2)
    tv = TorchViT(img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=DEPTH, num_heads=NH,
                  mlp_ratio=2.0, out_chans=32, window_size=2, global_attn_indexes=(1,),
                  use_rel_pos=True, use_abs_pos=True).eval()
    # the reference rescales pos_embed by img_size/1024 at forward (a quirk
    # for 1024-trained weights; encoders.py:140) — on a 4x4 grid that rounds
    # to 0x0 and crashes. Setting the attr to 1024 takes the no-resize path,
    # which is what our encoder implements.
    tv.img_size = 1024
    sd = tv.state_dict()

    jv = ImageEncoderViT(img_size=IMG, patch=PATCH, dim=DIM, depth=DEPTH, num_heads=NH,
                         mlp_ratio=2.0, window_size=2, global_idx=(1,), out_chans=32).finalize("vit")
    p = jv.init(jax.random.PRNGKey(0))
    p["patch_embed"] = _conv(sd, "patch_embed.proj")
    p["pos_embed"] = _t2n(sd["pos_embed"])
    for i in range(DEPTH):
        b = p["blocks"][str(i)]
        t = f"blocks.{i}"
        b["norm1"], b["norm2"] = _ln(sd, f"{t}.norm1"), _ln(sd, f"{t}.norm2")
        b["attn"]["qkv"] = _lin(sd, f"{t}.attn.qkv")
        b["attn"]["proj"] = _lin(sd, f"{t}.attn.proj")
        b["attn"]["rel_h"] = _t2n(sd[f"{t}.attn.rel_pos_h"])
        b["attn"]["rel_w"] = _t2n(sd[f"{t}.attn.rel_pos_w"])
        b["mlp"] = {"fc1": _lin(sd, f"{t}.mlp.lin1"), "fc2": _lin(sd, f"{t}.mlp.lin2")}
    p["neck1"] = _conv(sd, "neck.0")
    p["neck_ln1"] = _ln(sd, "neck.1")
    p["neck2"] = _conv(sd, "neck.2")
    p["neck_ln2"] = _ln(sd, "neck.3")

    x = np.random.default_rng(3).standard_normal((1, 3, IMG, IMG)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = _t2n(tv(torch.from_numpy(x)))  # [B, 32, g, g]
    out = np.asarray(jv(p, jnp.asarray(x.transpose(0, 2, 3, 1)), Context(training=False)))
    err = np.abs(out.transpose(0, 3, 1, 2) - ref).max()
    assert err < 1e-4, f"ViT embedding mismatch: {err}"
