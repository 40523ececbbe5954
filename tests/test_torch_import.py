"""Torch state_dict import: name rewriting + layout conversion + placement."""

import jax
import jax.numpy as jnp
import numpy as np

from rosettafold_tpu import PerformerConfig, RoseTTAFoldConfig
from rosettafold_tpu.models.rosettafold import RoseTTAFold
from rosettafold_tpu.utils.torch_import import _rewrite_name, import_state_dict


def test_name_rewrites():
    cases = {
        "msa_emb.to_embedding.weight": "msa_emb.to_embedding.weight",
        "pair_emb.proj.bias": "pair_emb.proj.bias",
        "two_track_blocks.0.msa_update_using_self_att.residue_wise_encoder_layers.1.attn.to_q.weight":
            "two_track_0.msa_update_using_self_att.residue_wise_1.attn.to_q.weight",
        "two_track_blocks.2.msa_update_using_self_att.residue_wise_encoder_layers.0.ff.fn.1.net.3.bias":
            "two_track_2.msa_update_using_self_att.residue_wise_0.ff.fc2.bias",
        "three_track_blocks.1.msa_update_using_self_att.residue_wise_encoder_layers.0.ln.weight":
            "three_track_1.two_track.msa_update_using_self_att.residue_wise_0.ln.weight",
        "three_track_blocks.0.coord_update_with_msa_and_pair.node_embed.0.weight":
            "three_track_0.coord_update_with_msa_and_pair.node_embed.weight",
        "three_track_blocks.0.coord_update_with_msa_and_pair.se3_transformer.Gblock.0.GMAB.v.kernel_unary.(0,1).rp.net.1.bn.weight":
            "three_track_0.coord_update_with_msa_and_pair.se3.res_0.v.pc_0_1.rp.ln1.weight",
        "final_block.plddt_head.weight": "final_block.plddt_head.weight",
        "final_block.pair_update_with_msa.resnet.1.fn.5.weight":
            "final_block.two_track.pair_update_with_msa.conv2.weight",
        "prediction_head.dist_head.0.layer.4.layer.fn.0.weight":
            "prediction_head.dist_head.block_1.conv1.weight",
        "prediction_head.phi_head.0.layer.7.weight":
            "prediction_head.phi_head.proj_out.weight",
        "initial_coord_generation_with_msa_and_pair.blocks.2.attn.node_to_q.weight":
            "initial_coords.block_2.attn.node_to_q.weight",
        "two_track_blocks.0.pair_update_with_axial_attention.layers.3.layer.0.fn.0.bias":
            "two_track_0.pair_update_with_axial_attention.layer_3.ln_row.bias",
    }
    for torch_name, expected in cases.items():
        assert _rewrite_name(torch_name) == expected, (
            torch_name, _rewrite_name(torch_name), expected
        )


def test_import_places_and_transposes():
    cfg = RoseTTAFoldConfig(
        d_msa=24, d_pair=16, d_node=8, d_edge=8, d_state=8,
        n_two_track_blocks=1, n_three_track_blocks=2, n_encoder_layers=1,
        max_len=32, n_neighbors=(4, 4),
        performer=PerformerConfig(dim_head=8, nb_features=8),
    )
    model = RoseTTAFold(config=cfg)
    B, N, L = 1, 2, 8
    msa = jnp.zeros((B, N, L), jnp.int32)
    aa = jnp.tile(jnp.arange(L)[None], (B, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), msa, msa[:, 0], aa)["params"]

    rng = np.random.default_rng(0)
    w_emb = rng.normal(size=(21, 24)).astype(np.float32)
    w_lin = rng.normal(size=(16, 16 + 1)).astype(np.float32)  # pair proj (out,in)
    b_lin = rng.normal(size=(16,)).astype(np.float32)
    state_dict = {
        "msa_emb.to_embedding.weight": w_emb,
        "pair_emb.proj.weight": w_lin,
        "pair_emb.proj.bias": b_lin,
    }
    new_params, report = import_state_dict(state_dict, params)
    assert sorted(report["loaded"]) == sorted(state_dict.keys()), report
    np.testing.assert_array_equal(
        np.asarray(new_params["msa_emb"]["to_embedding"]["embedding"]), w_emb
    )
    # Linear weights transposed into (in, out) kernels
    np.testing.assert_array_equal(
        np.asarray(new_params["pair_emb"]["proj"]["kernel"]), w_lin.T
    )
    np.testing.assert_array_equal(
        np.asarray(new_params["pair_emb"]["proj"]["bias"]), b_lin
    )
    # untouched subtrees stay at init
    np.testing.assert_array_equal(
        np.asarray(new_params["final_block"]["plddt_head"]["kernel"]),
        np.asarray(params["final_block"]["plddt_head"]["kernel"]),
    )


def test_import_reports_unmapped():
    cfg = RoseTTAFoldConfig(
        d_msa=24, d_pair=16, d_node=8, d_edge=8, d_state=8,
        n_two_track_blocks=1, n_three_track_blocks=2, n_encoder_layers=1,
        max_len=32, n_neighbors=(4, 4),
        performer=PerformerConfig(dim_head=8, nb_features=8),
    )
    model = RoseTTAFold(config=cfg)
    msa = jnp.zeros((1, 2, 8), jnp.int32)
    aa = jnp.tile(jnp.arange(8)[None], (1, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), msa, msa[:, 0], aa)["params"]
    sd = {"no.such.module.weight": np.zeros((3, 3), np.float32)}
    _, report = import_state_dict(sd, params)
    assert report["unmapped"] == ["no.such.module.weight"]
