"""Reference (PyTorch) state_dict -> graph_weather_tpu param tree converters.

Works on plain `{name: numpy array}` dicts, so torch is NOT required — load
a checkpoint elsewhere with `torch.load(...)['state_dict']` and pass
`{k: v.numpy() for k, v in sd.items()}`, or hand this script a .npz.

Mappings implemented:
  * GraphWeatherForecaster  (reference models/forecast.py:61) ->
    graph_weather_tpu.GraphWeatherForecaster param tree.
  * GenCast Denoiser        (reference models/gencast/denoiser.py:66) ->
    graph_weather_tpu.models.gencast.Denoiser param tree.
  * GenDA                   (reference models/genda/model.py:66; identical
    module tree to the Denoiser) -> graph_weather_tpu.models.genda.GenDA.
  * FGN                     (reference models/fgn/model.py:60 +
    models/fgn/layers/processor.py:20) ->
    graph_weather_tpu.models.fgn.FunctionalGenerativeNetwork.
  * CaFAForecaster          (reference models/cafa/model.py:10) ->
    graph_weather_tpu.models.cafa.CaFAForecaster.
  * AuroraModel             (reference models/aurora/model.py:187) ->
    graph_weather_tpu.models.aurora.AuroraModel.
  * GraphWeatherAssimilator (reference models/analysis.py:52) ->
    graph_weather_tpu.models.analysis.GraphWeatherAssimilator.
  * RegionalForecaster      (reference models/regional_forecast.py:133) ->
    graph_weather_tpu.models.regional.RegionalForecaster.

Conventions handled:
  * torch Linear stores [out, in]; flax kernels are [in, out] (transpose).
  * torch nn.Sequential indices (model.0/2/4 = linears, trailing odd index
    = post-output norm) -> TorchLinear_k / LayerNorm_0.
  * the reference encoder/decoder index H3 rows in REVERSED sorted-cell
    order (reference models/layers/encoder.py:80-85: h_index counts down),
    so the learnable `h3_nodes` table is row-reversed into our cell-order
    `mesh_nodes`. NOTE the reference's latent PROCESSOR graph uses
    ascending order against those reversed rows (encoder.py:244-268 via
    base_h3_map) — reproducing that net function therefore also needs the
    reversal-conjugated latent graph; see parity/generate_goldens.py.

CLI: scripts/convert_torch.py (thin wrapper over this module).
"""

from __future__ import annotations

import argparse

import numpy as np


def _linear(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _mlp(sd, prefix, hidden_layers=2, norm=True):
    """reference MLP (graph_net_block.py:17) -> our nn.mlp.MLP params."""
    out = {}
    n_linear = hidden_layers + 1
    for i in range(n_linear):
        out[f"TorchLinear_{i}"] = _linear(sd, f"{prefix}.model.{2 * i}")
    if norm:
        idx = 2 * n_linear - 1
        out["LayerNorm_0"] = {
            "scale": np.asarray(sd[f"{prefix}.model.{idx}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.model.{idx}.bias"]),
        }
    return out


def _processor_block(sd, prefix, hidden_layers=2):
    """reference MetaLayer block (edge_model/node_model) -> our
    GraphProcessorBlock {EdgeBlock_0, NodeBlock_0} params."""
    return {
        "EdgeBlock_0": {
            "MLP_0": _mlp(sd, f"{prefix}.edge_model.edge_mlp", hidden_layers)
        },
        "NodeBlock_0": {
            "MLP_0": _mlp(sd, f"{prefix}.node_model.node_mlp", hidden_layers)
        },
    }


def convert_forecaster(
    sd: dict,
    num_blocks: int = 9,
    hidden_layers_processor: int = 2,
    hidden_layers_decoder: int = 2,
) -> dict:
    """Reference GraphWeatherForecaster state_dict -> flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    encoder = {
        # reference h3_nodes row g holds the feature of sorted cell
        # (N-1-g); our mesh_nodes is cell-ordered -> reverse rows.
        "mesh_nodes": sd["encoder.h3_nodes"][::-1].copy(),
        "MLP_0": _mlp(sd, "encoder.node_encoder", hidden_layers_processor),
        "MLP_1": _mlp(sd, "encoder.edge_encoder", hidden_layers_processor),
        "MLP_2": _mlp(sd, "encoder.latent_edge_encoder", hidden_layers_processor),
        "GraphProcessorBlock_0": _processor_block(
            sd, "encoder.graph_processor.blocks.0", hidden_layers_processor
        ),
    }
    processor = {
        "GraphProcessor_0": {
            f"GraphProcessorBlock_{i}": _processor_block(
                sd, f"processor.graph_processor.blocks.{i}",
                hidden_layers_processor,
            )
            for i in range(num_blocks)
        }
    }
    decoder = {
        "MLP_0": _mlp(sd, "decoder.edge_encoder", 2),
        "GraphProcessorBlock_0": _processor_block(
            sd, "decoder.graph_processor.blocks.0", hidden_layers_processor
        ),
        "MLP_1": _mlp(
            sd, "decoder.node_decoder", hidden_layers_decoder, norm=False
        ),
    }
    return {
        "params": {
            "Encoder_0": encoder,
            "Processor_0": processor,
            "Decoder_0": decoder,
        }
    }


def _gencast_mlp(sd, prefix, n_linear, norm=True):
    """reference gencast MLP (gencast/layers/modules.py:11) -> GenCastMLP.

    Torch layout: linears.{i}; optional trailing norm_layer.
    """
    out = {
        f"TorchLinear_{i}": _linear(sd, f"{prefix}.linears.{i}")
        for i in range(n_linear)
    }
    if norm:
        out["LayerNorm_0"] = {
            "scale": np.asarray(sd[f"{prefix}.norm_layer.weight"]),
            "bias": np.asarray(sd[f"{prefix}.norm_layer.bias"]),
        }
    return out


def _interaction_network(sd, prefix, n_linear):
    """reference InteractionNetwork (modules.py:70) -> ours.

    The reference's message MLP concatenates [x_i(receiver), x_j(sender),
    e] (modules.py:124); ours takes [sender, receiver, e] — swap the first
    layer's receiver/sender input-row blocks. In GenCast both node dims
    equal the edge dim (everything is the hidden size), so the input
    splits into equal thirds.
    """
    edges = _gencast_mlp(sd, f"{prefix}.mlp_edges", n_linear)
    k = edges["TorchLinear_0"]["kernel"]  # [recv+send+edge, H]
    third = k.shape[0] // 3
    edges["TorchLinear_0"]["kernel"] = np.concatenate(
        [k[third : 2 * third], k[:third], k[2 * third :]], axis=0
    )
    return {
        "GenCastMLP_0": edges,
        "GenCastMLP_1": _gencast_mlp(sd, f"{prefix}.mlp_nodes", n_linear),
    }


def _cond_layer_norm(sd, prefix):
    return {
        "TorchLinear_0": _linear(sd, f"{prefix}.linear_scale"),
        "TorchLinear_1": _linear(sd, f"{prefix}.linear_bias"),
    }


def _transformer_conv(sd, prefix):
    """PyG TransformerConv tensors -> our GraphTransformerConv.

    PyG names: lin_query/lin_key/lin_value (+lin_edge, lin_skip, lin_beta).
    Ours (modules.py GraphTransformerConv): TorchLinear_{0,1,2} = q,k,v;
    TorchLinear_3 = edge (optional, bias-free); skip/beta at the tail.

    The beta-gate input order differs: PyG feeds [out, x_r, out - x_r]
    (torch_geometric/nn/conv/transformer_conv.py), ours [skip, out,
    skip - out]. With chunks (W1, W2, W3) of PyG's lin_beta, the gate
    W1 out + W2 x_r + W3 (out - x_r) equals our V1 skip + V2 out +
    V3 (skip - out) for V = (W2 - W3, W1 + W3, 0).
    """
    out = {
        "TorchLinear_0": _linear(sd, f"{prefix}.lin_query"),
        "TorchLinear_1": _linear(sd, f"{prefix}.lin_key"),
        "TorchLinear_2": _linear(sd, f"{prefix}.lin_value"),
    }
    nxt = 3
    if f"{prefix}.lin_edge.weight" in sd:
        out[f"TorchLinear_{nxt}"] = {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.lin_edge.weight"].T)
        }
        nxt += 1
    out[f"TorchLinear_{nxt}"] = _linear(sd, f"{prefix}.lin_skip")
    w = np.asarray(sd[f"{prefix}.lin_beta.weight"])  # [1, 3F]
    w1, w2, w3 = np.split(w, 3, axis=1)
    v = np.concatenate([w2 - w3, w1 + w3, np.zeros_like(w3)], axis=1)
    out[f"TorchLinear_{nxt + 1}"] = {"kernel": np.ascontiguousarray(v.T)}
    return out


def convert_denoiser(
    sd: dict, num_blocks: int = 16, mlp_hidden_dims: int = 2
) -> dict:
    """Reference gencast Denoiser state_dict -> flax params.

    mlp_hidden_dims = len(hidden_dims) of the reference config (number of
    linears in each GenCastMLP).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    n_lin = mlp_hidden_dims
    enc = {
        "GenCastMLP_0": _gencast_mlp(sd, "encoder.grid_mlp", n_lin),
        "GenCastMLP_1": _gencast_mlp(sd, "encoder.mesh_mlp", n_lin),
        "GenCastMLP_2": _gencast_mlp(sd, "encoder.edges_mlp", n_lin),
        "InteractionNetwork_0": _interaction_network(sd, "encoder.gnn", n_lin),
        "GenCastMLP_3": _gencast_mlp(sd, "encoder.grid_mlp_final", n_lin),
    }
    blocks = {}
    for i in range(num_blocks):
        p = f"processor.cond_transformers.{i}"
        blocks[f"CondTransformerBlock_{i}"] = {
            "GraphTransformerConv_0": _transformer_conv(
                sd, f"{p}.transformer_conv"
            ),
            "ConditionalLayerNorm_0": _cond_layer_norm(sd, f"{p}.cond_norm"),
        }
    proc = {
        "FourierEmbedding_0": {
            "TorchLinear_0": _linear(sd, "processor.fourier_embedder.mlp.0"),
            "TorchLinear_1": _linear(sd, "processor.fourier_embedder.mlp.2"),
        },
        **blocks,
    }
    if "processor.edges_mlp.linears.0.weight" in sd:
        # Present when the processor consumes k-hop edge features.
        proc["GenCastMLP_0"] = _gencast_mlp(sd, "processor.edges_mlp", n_lin)
    dec = {
        "GenCastMLP_0": _gencast_mlp(sd, "decoder.edges_mlp", n_lin),
        "InteractionNetwork_0": _interaction_network(sd, "decoder.gnn", n_lin),
        "GenCastMLP_1": _gencast_mlp(sd, "decoder.grid_mlp_final", n_lin),
    }
    return {
        "params": {
            "GenCastEncoder_0": enc,
            "GenCastProcessor_0": proc,
            "GenCastDecoder_0": dec,
        }
    }


def convert_genda(sd: dict, num_blocks: int = 16, mlp_hidden_dims: int = 2) -> dict:
    """Reference GenDA state_dict -> flax params.

    GenDA (reference models/genda/model.py:66-174) instantiates the SAME
    encoder/processor/decoder modules as the gencast Denoiser (only the
    encoder's grid input dim grows by conditioning_dim), so the Denoiser
    mapping applies verbatim. The non-trainable Preconditioner contributes
    no tensors.
    """
    return convert_denoiser(sd, num_blocks=num_blocks, mlp_hidden_dims=mlp_hidden_dims)


def convert_fgn(
    sd: dict,
    num_blocks: int = 24,
    mlp_hidden_dims: int = 2,
    use_edges_features: bool = True,
) -> dict:
    """Reference FGN state_dict -> flax params.

    Reference models/fgn/model.py:60: gencast Encoder/Decoder plus an
    FGN Processor (models/fgn/layers/processor.py:20) = the GenCast block
    stack conditioned directly on the noise vector (no Fourier embedding).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    n_lin = mlp_hidden_dims
    enc = {
        "GenCastMLP_0": _gencast_mlp(sd, "encoder.grid_mlp", n_lin),
        "GenCastMLP_1": _gencast_mlp(sd, "encoder.mesh_mlp", n_lin),
        "GenCastMLP_2": _gencast_mlp(sd, "encoder.edges_mlp", n_lin),
        "InteractionNetwork_0": _interaction_network(sd, "encoder.gnn", n_lin),
        "GenCastMLP_3": _gencast_mlp(sd, "encoder.grid_mlp_final", n_lin),
    }
    proc = {}
    if use_edges_features:
        proc["GenCastMLP_0"] = _gencast_mlp(sd, "processor.edges_mlp", n_lin)
    for i in range(num_blocks):
        p = f"processor.cond_transformers.{i}"
        proc[f"CondTransformerBlock_{i}"] = {
            "GraphTransformerConv_0": _transformer_conv(
                sd, f"{p}.transformer_conv"
            ),
            "ConditionalLayerNorm_0": _cond_layer_norm(sd, f"{p}.cond_norm"),
        }
    dec = {
        "GenCastMLP_0": _gencast_mlp(sd, "decoder.edges_mlp", n_lin),
        "InteractionNetwork_0": _interaction_network(sd, "decoder.gnn", n_lin),
        "GenCastMLP_1": _gencast_mlp(sd, "decoder.grid_mlp_final", n_lin),
    }
    return {
        "params": {
            "GenCastEncoder_0": enc,
            "FGNProcessor_0": proc,
            "GenCastDecoder_0": dec,
        }
    }


def _conv2d(sd, prefix):
    """torch Conv2d [out, in, kh, kw] -> flax Conv kernel [kh, kw, in, out]."""
    out = {
        "kernel": np.ascontiguousarray(
            np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))
        )
    }
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _conv_transpose2d(sd, prefix):
    """torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose
    kernel [kh, kw, in, out].

    flax ConvTranspose (lax.conv_transpose, transpose_kernel=False) applies
    the kernel unmirrored, while torch's transposed conv places w[a, b] at
    output offset (a, b) — i.e. the mirrored placement — so the spatial
    dims are flipped here.
    """
    w = np.transpose(sd[f"{prefix}.weight"], (2, 3, 0, 1))[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _layer_norm(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def convert_cafa(sd: dict, processor_depth: int = 6) -> dict:
    """Reference CaFAForecaster state_dict -> flax params.

    Reference models/cafa/model.py:10 + factorize.py: conv encoder, depth x
    FactorizedTransformerBlock (height/width axial attention + FFN), conv-
    transpose decoder.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def axial(prefix):
        return {
            "TorchLinear_0": {
                "kernel": np.ascontiguousarray(sd[f"{prefix}.to_qkv.weight"].T)
            },
            "TorchLinear_1": _linear(sd, f"{prefix}.to_out"),
        }

    blocks = {}
    for i in range(processor_depth):
        p = f"processor.blocks.{i}"
        blocks[f"FactorizedTransformerBlock_{i}"] = {
            "LayerNorm_0": _layer_norm(sd, f"{p}.norm1"),
            "FactorizedAttention_0": {
                "LayerNorm_0": _layer_norm(sd, f"{p}.attn.norm1"),
                "AxialAttention_0": axial(f"{p}.attn.attn_height"),
                "LayerNorm_1": _layer_norm(sd, f"{p}.attn.norm2"),
                "AxialAttention_1": axial(f"{p}.attn.attn_width"),
            },
            "LayerNorm_1": _layer_norm(sd, f"{p}.norm2"),
            "FeedForward_0": {
                "TorchLinear_0": _linear(sd, f"{p}.ffn.0"),
                "TorchLinear_1": _linear(sd, f"{p}.ffn.3"),
            },
        }
    return {
        "params": {
            "CaFAEncoder_0": {"Conv_0": _conv2d(sd, "encoder.encoder")},
            "CaFAProcessor_0": blocks,
            "CaFADecoder_0": {
                "ConvTranspose_0": _conv_transpose2d(sd, "decoder.decoder")
            },
        }
    }


def _mha(sd, prefix, num_heads):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])  # [3E, E]
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])  # [3E]
    e = w.shape[1]
    hd = e // num_heads
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)

    def proj(wi, bi):
        return {
            "kernel": np.ascontiguousarray(wi.T).reshape(e, num_heads, hd),
            "bias": bi.reshape(num_heads, hd),
        }

    return {
        "query": proj(qw, qb),
        "key": proj(kw, kb),
        "value": proj(vw, vb),
        "out": {
            "kernel": np.ascontiguousarray(
                sd[f"{prefix}.out_proj.weight"].T
            ).reshape(num_heads, hd, e),
            "bias": np.asarray(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def convert_aurora(sd: dict, num_layers: int = 4, num_heads: int = 8) -> dict:
    """Reference AuroraModel state_dict -> flax params.

    Reference models/aurora/model.py:187: PointEncoder (coord + feature
    MLPs summed), PointCloudProcessor (post-norm MHA blocks), PointDecoder.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc = {
        "_XavierLinear_0": _linear(sd, "encoder.coord_encoder.0"),
        "LayerNorm_0": _layer_norm(sd, "encoder.coord_encoder.1"),
        "_XavierLinear_1": _linear(sd, "encoder.coord_encoder.3"),
        "_XavierLinear_2": _linear(sd, "encoder.feature_encoder.0"),
        "LayerNorm_1": _layer_norm(sd, "encoder.feature_encoder.1"),
        "_XavierLinear_3": _linear(sd, "encoder.feature_encoder.3"),
        "LayerNorm_2": _layer_norm(sd, "encoder.norm"),
    }
    proc = {}
    for i in range(num_layers):
        p = f"processor.layers.{i}"
        proc[f"SelfAttentionLayer_{i}"] = {
            "MultiHeadDotProductAttention_0": _mha(
                sd, f"{p}.attention", num_heads
            ),
            "LayerNorm_0": _layer_norm(sd, f"{p}.norm1"),
            "_XavierLinear_0": _linear(sd, f"{p}.ffn.0"),
            "_XavierLinear_1": _linear(sd, f"{p}.ffn.2"),
            "LayerNorm_1": _layer_norm(sd, f"{p}.norm2"),
        }
    dec = {
        "_XavierLinear_0": _linear(sd, "decoder.decoder.0"),
        "_XavierLinear_1": _linear(sd, "decoder.decoder.2"),
    }
    return {
        "params": {
            "PointEncoder_0": enc,
            "PointCloudProcessor_0": proc,
            "PointDecoder_0": dec,
        }
    }


def convert_assimilator(
    sd: dict,
    num_blocks: int = 9,
    hidden_layers_processor: int = 2,
    hidden_layers_decoder: int = 2,
) -> dict:
    """Reference GraphWeatherAssimilator state_dict -> flax params.

    Reference models/analysis.py:52 + layers/assimilator_{encoder,
    decoder}.py. The encoder's single obs->mesh message-passing round is
    inlined in our AssimilatorEncoder (MLP_2 = edge model, MLP_3 = node
    model); its non-learnable zero h3_nodes seed has no tensor. The
    reference's reversed H3 row indexing (assimilator_encoder.py:190-194,
    assimilator_decoder.py:73-78) needs the reversal-conjugated latent
    graph to reproduce — see models/forecast.py:reversal_conjugated_latent.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    hl = hidden_layers_processor
    encoder = {
        "MLP_0": _mlp(sd, "encoder.node_encoder", hl),
        "MLP_1": _mlp(sd, "encoder.edge_encoder", hl),
        "MLP_2": _mlp(
            sd, "encoder.graph_processor.blocks.0.edge_model.edge_mlp", hl
        ),
        "MLP_3": _mlp(
            sd, "encoder.graph_processor.blocks.0.node_model.node_mlp", hl
        ),
        "MLP_4": _mlp(sd, "encoder.latent_edge_encoder", hl),
    }
    processor = {
        "GraphProcessor_0": {
            f"GraphProcessorBlock_{i}": _processor_block(
                sd, f"processor.graph_processor.blocks.{i}", hl
            )
            for i in range(num_blocks)
        }
    }
    decoder = {
        "MLP_0": _mlp(sd, "decoder.edge_encoder", 2),
        "GraphProcessorBlock_0": _processor_block(
            sd, "decoder.graph_processor.blocks.0", hl
        ),
        "MLP_1": _mlp(
            sd, "decoder.node_decoder", hidden_layers_decoder, norm=False
        ),
    }
    return {
        "params": {
            "AssimilatorEncoder_0": encoder,
            "Processor_0": processor,
            "Decoder_0": decoder,
        }
    }


def convert_regional(
    sd: dict,
    num_blocks: int = 9,
    hidden_layers_processor: int = 2,
    hidden_layers_decoder: int = 2,
    enable_nudging: bool = False,
) -> dict:
    """Reference RegionalForecaster state_dict -> flax params.

    Reference models/regional_forecast.py:133-298: global h3_embeddings
    table, bipartite encoder GNN, latent processor, reversed-edge decoder
    GNN, node decoder (WITH norm, unlike the global forecaster), optional
    BoundaryNudgingLayer.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    hl = hidden_layers_processor
    params = {
        "h3_embeddings": sd["h3_embeddings"],
        "MLP_0": _mlp(sd, "node_encoder", hl),
        "MLP_1": _mlp(sd, "edge_encoder", hl),
        "GraphProcessorBlock_0": _processor_block(sd, "encoder_gnn.blocks.0", hl),
        "MLP_2": _mlp(sd, "latent_edge_encoder", hl),
        "Processor_0": {
            "GraphProcessor_0": {
                f"GraphProcessorBlock_{i}": _processor_block(
                    sd, f"processor.graph_processor.blocks.{i}", hl
                )
                for i in range(num_blocks)
            }
        },
        "MLP_3": _mlp(sd, "decoder_edge_encoder", hl),
        "GraphProcessorBlock_1": _processor_block(sd, "decoder_gnn.blocks.0", hl),
        "MLP_4": _mlp(sd, "node_decoder", hidden_layers_decoder),
    }
    if enable_nudging:
        params["BoundaryNudgingLayer_0"] = {
            "MLP_0": _mlp(sd, "nudging.blend_mlp", 1, norm=False)
        }
    return {"params": params}


def _layer_norm_eps(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _fengwu_attention(sd, prefix):
    """reference fengwu_ghr Attention (layers.py:63) -> our _Attention."""
    return {
        "LayerNorm_0": _layer_norm_eps(sd, f"{prefix}.norm"),
        "TorchLinear_0": {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.to_qkv.weight"].T)
        },
        "TorchLinear_1": {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.to_out.weight"].T)
        },
    }


def convert_fengwu_image_meta(sd: dict, depth: int, res: bool = False) -> dict:
    """Reference fengwu_ghr ImageMetaModel state_dict (layers.py:151) ->
    flax params for our ImageMetaModel (res=True adds the wrapper's
    cross-window attention layers, layers.py:245)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "LayerNorm_0": _layer_norm_eps(sd, "to_patch_embedding.1"),
        "TorchLinear_0": _linear(sd, "to_patch_embedding.2"),
        "LayerNorm_1": _layer_norm_eps(sd, "to_patch_embedding.3"),
    }
    tr = {"LayerNorm_0": _layer_norm_eps(sd, "transformer.norm")}
    n_attn = 0
    for i in range(depth):
        tr[f"_Attention_{n_attn}"] = _fengwu_attention(
            sd, f"transformer.layers.{i}.0"
        )
        n_attn += 1
        tr[f"_FeedForward_{i}"] = {
            "LayerNorm_0": _layer_norm_eps(sd, f"transformer.layers.{i}.1.net.0"),
            "TorchLinear_0": _linear(sd, f"transformer.layers.{i}.1.net.1"),
            "TorchLinear_1": _linear(sd, f"transformer.layers.{i}.1.net.3"),
        }
        if res:
            # res_layers.{i} = [Rearrange, Attention, Rearrange]
            tr[f"_Attention_{n_attn}"] = _fengwu_attention(
                sd, f"transformer.res_layers.{i}.1"
            )
            n_attn += 1
    params["Transformer_0"] = tr
    return {"params": params}


def convert_fengwu_wrapper(sd: dict, depth: int) -> dict:
    """Reference WrapperImageModel/WrapperMetaModel state_dict (keys under
    image_meta_model.*) -> our WrapperImageModel params."""
    inner = {
        k[len("image_meta_model."):]: v
        for k, v in sd.items()
        if k.startswith("image_meta_model.")
    }
    imm = convert_fengwu_image_meta(inner, depth, res=True)
    return {"params": {"image_meta_model": imm["params"]}}


def _conv_nd(sd, prefix):
    """torch Conv2d/3d [out, in, *k] -> flax [*k, in, out]."""
    w = np.asarray(sd[f"{prefix}.weight"])
    axes = tuple(range(2, w.ndim)) + (1, 0)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, axes))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _batch_norm(sd, prefix):
    """torch BatchNorm -> (flax params, batch_stats)."""
    return (
        {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        },
        {
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        },
    )


def _wm_natten(sd, prefix):
    """natten NeighborhoodAttention3D -> our NeighborhoodAttention3D."""
    return {
        "TorchLinear_0": _linear(sd, f"{prefix}.qkv"),
        "rpb": np.asarray(sd[f"{prefix}.rpb"]),
        "TorchLinear_1": _linear(sd, f"{prefix}.proj"),
    }


def _wm_conv_block(sd, prefix, up: bool):
    """reference ConvDownBlock/ConvUpBlock (weathermesh/layers.py:10/77)
    -> our ConvDownBlock/ConvUpBlock (params, batch_stats). Creation
    order in our blocks: identity conv+norm first, then conv1, conv2."""
    ident = "upsample" if up else "downsample"
    ident_bn = "bn_up" if up else "bn_down"
    p0, s0 = _batch_norm(sd, f"{prefix}.{ident_bn}")
    p1, s1 = _batch_norm(sd, f"{prefix}.bn1")
    p2, s2 = _batch_norm(sd, f"{prefix}.bn2")
    params = {
        "Conv_0": _conv_nd(sd, f"{prefix}.{ident}"),
        "BatchNorm_0": p0,
        "Conv_1": _conv_nd(sd, f"{prefix}.conv1"),
        "BatchNorm_1": p1,
        "Conv_2": _conv_nd(sd, f"{prefix}.conv2"),
        "BatchNorm_2": p2,
    }
    stats = {"BatchNorm_0": s0, "BatchNorm_1": s1, "BatchNorm_2": s2}
    return params, stats


def _group_norm(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def convert_thermalizer(sd: dict, simple: bool = False) -> dict:
    """Reference ThermalizerLayer state_dict (models/layers/
    thermalizer.py:120-137: score_model = AdaptiveUNet) -> our
    ThermalizerLayer params.

    The reference UNet's Sequential indices: contract blocks are
    [Conv2d, GroupNorm, ReLU, Conv2d, GroupNorm, ReLU, MaxPool] (0,1,3,4);
    expand blocks append a ConvTranspose2d at index 6; simple_net is
    [Conv, GN, ReLU] x3 + Conv (0,1,3,4,6,7,9). `simple=True` converts
    the tiny-grid simple_net path (used when min(H, W) <= 4)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    unet: dict = {}
    if simple:
        for j, idx in enumerate((0, 3, 6, 9)):
            unet[f"Conv_{j}"] = _conv2d(sd, f"score_model.simple_net.{idx}")
        for j, idx in enumerate((1, 4, 7)):
            unet[f"GroupNorm_{j}"] = _group_norm(
                sd, f"score_model.simple_net.{idx}"
            )
        return {"params": {"AdaptiveUNet_0": unet}}

    def block(prefix, transpose=False):
        p = {
            "Conv_0": _conv2d(sd, f"{prefix}.0"),
            "GroupNorm_0": _group_norm(sd, f"{prefix}.1"),
            "Conv_1": _conv2d(sd, f"{prefix}.3"),
            "GroupNorm_1": _group_norm(sd, f"{prefix}.4"),
        }
        if transpose:
            p["ConvTranspose_0"] = _conv_transpose2d(sd, f"{prefix}.6")
        return p

    for j, name in enumerate(("conv1", "conv2", "conv3")):
        unet[f"_ContractBlock_{j}"] = block(f"score_model.{name}")
    for j, name in enumerate(("upconv3", "upconv2", "upconv1")):
        unet[f"_ExpandBlock_{j}"] = block(
            f"score_model.{name}", transpose=True
        )
    return {"params": {"AdaptiveUNet_0": unet}}


def convert_weathermesh(
    sd: dict,
    num_processors: int = 2,
    processor_num_layers: int = 10,
    encoder_num_conv_blocks: int = 3,
    encoder_num_transformer_layers: int = 3,
    decoder_num_conv_blocks: int = 3,
    decoder_num_transformer_layers: int = 3,
) -> dict:
    """Reference WeatherMesh state_dict (models/weathermesh/weathermesh2.py;
    processor params under synthetic 'processors.{p}.' keys — the reference
    keeps processors in a plain list, so they are absent from its own
    state_dict) -> our WeatherMesh(norm='batch') variables
    {params, batch_stats}."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    enc_p: dict = {}
    enc_s: dict = {}
    for i in range(encoder_num_conv_blocks):
        p, s = _wm_conv_block(sd, f"encoder.surface_path.{i}", up=False)
        enc_p[f"ConvDownBlock_{2 * i}"], enc_s[f"ConvDownBlock_{2 * i}"] = p, s
        p, s = _wm_conv_block(sd, f"encoder.pressure_path.{i}", up=False)
        enc_p[f"ConvDownBlock_{2 * i + 1}"] = p
        enc_s[f"ConvDownBlock_{2 * i + 1}"] = s
    enc_p["Conv_0"] = _conv_nd(sd, "encoder.to_latent")
    for i in range(encoder_num_transformer_layers):
        enc_p[f"NeighborhoodAttention3D_{i}"] = _wm_natten(
            sd, f"encoder.transformer_layers.{i}"
        )
    params["WeatherMeshEncoder_0"] = enc_p
    stats["WeatherMeshEncoder_0"] = enc_s

    # Processors live under the rollout scan chain scope ("processors"),
    # one WeatherMeshProcessor per timestep (models/weathermesh/model.py).
    params["processors"] = {
        f"WeatherMeshProcessor_{p_i}": {
            f"NeighborhoodAttention3D_{i}": _wm_natten(
                sd, f"processors.{p_i}.layers.{i}"
            )
            for i in range(processor_num_layers)
        }
        for p_i in range(num_processors)
    }

    dec_p: dict = {}
    dec_s: dict = {}
    for i in range(decoder_num_transformer_layers):
        dec_p[f"NeighborhoodAttention3D_{i}"] = _wm_natten(
            sd, f"decoder.transformer_layers.{i}"
        )
    dec_p["Conv_0"] = _conv_nd(sd, "decoder.split")
    # decoder loops i = n-1 .. 0, creating (pressure, surface) per step;
    # reference path lists are already in reversed order (index j = step).
    for j in range(decoder_num_conv_blocks):
        p, s = _wm_conv_block(sd, f"decoder.pressure_path.{j}", up=True)
        dec_p[f"ConvUpBlock_{2 * j}"], dec_s[f"ConvUpBlock_{2 * j}"] = p, s
        p, s = _wm_conv_block(sd, f"decoder.surface_path.{j}", up=True)
        dec_p[f"ConvUpBlock_{2 * j + 1}"] = p
        dec_s[f"ConvUpBlock_{2 * j + 1}"] = s
    params["WeatherMeshDecoder_0"] = dec_p
    stats["WeatherMeshDecoder_0"] = dec_s

    return {"params": params, "batch_stats": stats}


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--model",
        choices=[
            "forecaster", "denoiser", "genda", "fgn", "cafa", "aurora",
            "assimilator", "regional", "fengwu_ghr", "weathermesh",
        ],
        required=True,
    )
    p.add_argument("--inp", required=True, help=".npz of the torch state_dict, or a torch .pt")
    p.add_argument("--out", required=True, help="output .msgpack of flax params")
    p.add_argument("--num-blocks", type=int, default=None)
    args = p.parse_args()

    if args.inp.endswith(".npz"):
        sd = dict(np.load(args.inp))
    else:
        import torch

        raw = torch.load(args.inp, map_location="cpu", weights_only=True)
        raw = raw.get("state_dict", raw)
        sd = {k: v.numpy() for k, v in raw.items()}

    nb = args.num_blocks
    if args.model == "forecaster":
        params = convert_forecaster(sd, num_blocks=nb or 9)
    elif args.model == "denoiser":
        params = convert_denoiser(sd, num_blocks=nb or 16)
    elif args.model == "genda":
        params = convert_genda(sd, num_blocks=nb or 16)
    elif args.model == "fgn":
        params = convert_fgn(
            sd,
            num_blocks=nb or 24,
            use_edges_features="processor.edges_mlp.linears.0.weight" in sd,
        )
    elif args.model == "cafa":
        depth = 1 + max(
            int(k.split(".")[2])
            for k in sd
            if k.startswith("processor.blocks.")
        )
        params = convert_cafa(sd, processor_depth=depth)
    elif args.model == "aurora":
        layers = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("processor.layers.")
        )
        params = convert_aurora(sd, num_layers=layers)
    elif args.model == "assimilator":
        params = convert_assimilator(sd, num_blocks=nb or 9)
    elif args.model == "weathermesh":
        def _count(pat):
            hits = [
                int(k[len(pat):].split(".")[0]) for k in sd if k.startswith(pat)
            ]
            return 1 + max(hits) if hits else 0

        params = convert_weathermesh(
            sd,
            num_processors=_count("processors."),
            processor_num_layers=_count("processors.0.layers."),
            encoder_num_conv_blocks=_count("encoder.surface_path."),
            encoder_num_transformer_layers=_count("encoder.transformer_layers."),
            decoder_num_conv_blocks=_count("decoder.surface_path."),
            decoder_num_transformer_layers=_count("decoder.transformer_layers."),
        )
    elif args.model == "fengwu_ghr":
        depth = 1 + max(
            int(k.split("transformer.layers.")[1].split(".")[0])
            for k in sd
            if "transformer.layers." in k
        )
        if any(k.startswith("image_meta_model.") for k in sd):
            params = convert_fengwu_wrapper(sd, depth)
        else:
            params = convert_fengwu_image_meta(sd, depth)
    else:
        params = convert_regional(
            sd,
            num_blocks=nb or 9,
            enable_nudging="nudging.blend_mlp.model.0.weight" in sd,
        )

    from graph_weather_tpu.train.serialization import save_params

    save_params(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
