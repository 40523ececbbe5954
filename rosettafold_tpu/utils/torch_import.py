"""Import reference-style PyTorch checkpoints into rosettafold_tpu params.

Maps a flat torch state_dict ({name: array}) from dohlee/rosettafold-pytorch's
RoseTTAFold onto this framework's flax parameter tree, converting layouts:
Linear weight (out,in) -> kernel (in,out); Conv2d (O,I,kh,kw) -> (kh,kw,I,O);
LayerNorm/InstanceNorm weight -> scale; Embedding weight -> embedding.

Known, documented gaps (inherent to the reference, not this importer):
  * The reference stores some layer stacks in plain Python lists
    (rosettafold_pytorch.py:602-605, 699-702), so their parameters are absent
    from its state_dict; those subtrees keep this model's initialization.
  * performer-pytorch's random-feature projection buffers are not importable —
    here the projections are deterministic trace-time constants (feature_seed);
    FAVOR+ layers therefore agree in distribution, not bitwise.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _t_linear(w):  # torch Linear weight -> flax Dense kernel
    return np.asarray(w).T


def _t_conv(w):  # torch Conv2d OIHW -> flax HWIO
    return np.asarray(w).transpose(2, 3, 1, 0)


def _ident(w):
    return np.asarray(w)


def _squeeze0(w):
    return np.asarray(w).reshape(np.asarray(w).shape[-2:]) if np.asarray(w).ndim == 3 else np.asarray(w).reshape(-1)


# --- name-rewrite rules (applied in order, first full regex rewrite wins) ---
# Each entry: (torch regex, flax replacement). Parameter-leaf renames and layout
# transforms are decided afterwards from the leaf name + destination shape.

_ENCODER = [
    # tied attention internals
    (r"attn\.poswise_weight\.to_q\.0\.", r"attn.poswise_weight.to_q."),
    (r"attn\.poswise_weight\.to_k\.0\.", r"attn.poswise_weight.to_k."),
    # pre-LN + FF residual wrapper
    (r"ff\.fn\.0\.", r"ff_ln."),
    (r"ff\.fn\.1\.net\.0\.", r"ff.fc1."),
    (r"ff\.fn\.1\.net\.3\.", r"ff.fc2."),
]

_RULES = [
    # --- top level ---
    (r"^two_track_blocks\.(\d+)\.", r"two_track_\1."),
    (r"^three_track_blocks\.(\d+)\.", r"three_track_\1.two_track&"),
    (r"^final_block\.", r"final_block.two_track&"),
    (r"^initial_coord_generation_with_msa_and_pair\.", r"initial_coords."),
    (r"^prediction_head\.", r"prediction_head."),
]

# modules that live beside (not inside) the nested two_track in our blocks
_NOT_IN_TWO_TRACK = (
    "coord_update_with_msa_and_pair",
    "msa_update_with_pair_and_coord",
    "plddt_head",
)

_SUBRULES = [
    # encoder layer stacks
    (r"msa_update_using_self_att\.residue_wise_encoder_layers\.(\d+)\.",
     r"msa_update_using_self_att.residue_wise_\1."),
    (r"msa_update_using_self_att\.sequence_wise_encoder_layers\.(\d+)\.",
     r"msa_update_using_self_att.sequence_wise_\1."),
    (r"msa_update_with_pair\.encoder_layers\.(\d+)\.", r"msa_update_with_pair.layer_\1."),
    (r"pair_update_with_axial_attention\.layers\.(\d+)\.",
     r"pair_update_with_axial_attention.layer_\1."),
    # PairUpdateWithMsa internals
    (r"pair_update_with_msa\.proj_msa\.0\.", r"pair_update_with_msa.proj_msa_ln_in."),
    (r"pair_update_with_msa\.proj_msa\.1\.", r"pair_update_with_msa.proj_msa."),
    (r"pair_update_with_msa\.proj_msa\.2\.", r"pair_update_with_msa.proj_msa_ln_out."),
    (r"pair_update_with_msa\.outer_product_mean\.to_out\.0\.",
     r"pair_update_with_msa.outer_product_mean.ln."),
    (r"pair_update_with_msa\.outer_product_mean\.to_out\.1\.",
     r"pair_update_with_msa.outer_product_mean.to_out."),
    (r"pair_update_with_msa\.resnet\.0\.", r"pair_update_with_msa.resnet_in."),
    (r"pair_update_with_msa\.resnet\.1\.fn\.1\.", r"pair_update_with_msa.conv1."),
    (r"pair_update_with_msa\.resnet\.1\.fn\.2\.", r"pair_update_with_msa.in1."),
    (r"pair_update_with_msa\.resnet\.1\.fn\.5\.", r"pair_update_with_msa.conv2."),
    (r"pair_update_with_msa\.resnet\.1\.fn\.6\.", r"pair_update_with_msa.in2."),
    (r"pair_update_with_msa\.poswise_weight\.to_q\.0\.",
     r"pair_update_with_msa.poswise_weight.to_q."),
    (r"pair_update_with_msa\.poswise_weight\.to_k\.0\.",
     r"pair_update_with_msa.poswise_weight.to_k."),
    # axial attention LNs (Residual(Sequential(LN, ...)) wrappers)
    (r"(layer_\d+)\.layer\.0\.fn\.0\.", r"\1.ln_row."),
    (r"(layer_\d+)\.layer\.1\.fn\.0\.", r"\1.ln_col."),
    (r"(layer_\d+)\.layer\.2\.fn\.0\.", r"\1.ln_ff."),
    (r"(layer_\d+)\.ff\.net\.0\.", r"\1.ff.fc1."),
    (r"(layer_\d+)\.ff\.net\.3\.", r"\1.ff.fc2."),
    # MsaUpdateWithPairLayer internals
    (r"(layer_\d+)\.pair2att\.1\.", r"\1.pair_ln."),
    (r"(layer_\d+)\.pair2att\.2\.", r"\1.pair2att."),
    (r"(layer_\d+)\.msa2value\.0\.", r"\1.msa_ln."),
    (r"(layer_\d+)\.msa2value\.1\.", r"\1.msa2value."),
    # initial coord generation / coord update
    (r"initial_coords\.poswise_weight\.to_q\.0\.", r"initial_coords.poswise.to_q."),
    (r"initial_coords\.poswise_weight\.to_k\.0\.", r"initial_coords.poswise.to_k."),
    (r"initial_coords\.node_embed\.0\.", r"initial_coords.node_embed."),
    (r"initial_coords\.edge_embed\.0\.", r"initial_coords.edge_embed."),
    (r"initial_coords\.blocks\.(\d+)\.", r"initial_coords.block_\1."),
    (r"coord_update_with_msa_and_pair\.poswise_weight\.to_q\.0\.",
     r"coord_update_with_msa_and_pair.poswise.to_q."),
    (r"coord_update_with_msa_and_pair\.poswise_weight\.to_k\.0\.",
     r"coord_update_with_msa_and_pair.poswise.to_k."),
    (r"coord_update_with_msa_and_pair\.node_embed\.0\.",
     r"coord_update_with_msa_and_pair.node_embed."),
    (r"coord_update_with_msa_and_pair\.node_embed\.2\.",
     r"coord_update_with_msa_and_pair.node_ln."),
    (r"coord_update_with_msa_and_pair\.edge_embed\.0\.",
     r"coord_update_with_msa_and_pair.edge_embed."),
    (r"coord_update_with_msa_and_pair\.edge_embed\.2\.",
     r"coord_update_with_msa_and_pair.edge_ln."),
    (r"coord_update_with_msa_and_pair\.se3_transformer\.",
     r"coord_update_with_msa_and_pair.se3."),
    # graph transformer blocks
    (r"(block_\d+)\.attn\.", r"\1.attn."),
    (r"(block_\d+)\.to_out\.0\.", r"\1.to_out."),
    # SE3Transformer Gblock indices -> res_/norm_ names (2 layers + final)
    (r"se3\.Gblock\.0\.", r"se3.res_0."),
    (r"se3\.Gblock\.1\.", r"se3.norm_0."),
    (r"se3\.Gblock\.2\.", r"se3.res_1."),
    (r"se3\.Gblock\.3\.", r"se3.norm_1."),
    (r"se3\.Gblock\.4\.", r"se3.res_out."),
    # GSE3Res internals
    (r"GMAB\.v\.kernel_unary\.\((\d+),(\d+)\)\.rp\.", r"v.pc_\1_\2.rp."),
    (r"GMAB\.k\.kernel_unary\.\((\d+),(\d+)\)\.rp\.", r"k.pc_\1_\2.rp."),
    (r"GMAB\.q\.transform\.(\d+)$", r"q.W_\1"),
    (r"project\.transform\.(\d+)$", r"project.W_\1"),
    (r"project\.transform\.(\d+)\.0\.", r"project.ln_\1."),
    (r"project\.transform\.(\d+)\.2\.", r"project.fc_\1."),
    (r"bias\.(\d+)$", r"bias_\1"),
    # RadialFunc MLP: net.{0,3,6} Linear, net.{1,4} LayerNorm(BN wrapper)
    (r"rp\.net\.0\.", r"rp.fc1."),
    (r"rp\.net\.1\.bn\.", r"rp.ln1."),
    (r"rp\.net\.3\.", r"rp.fc2."),
    (r"rp\.net\.4\.bn\.", r"rp.ln2."),
    (r"rp\.net\.6\.", r"rp.fc3."),
    # MsaUpdateWithPairAndCoord FF wrapper
    (r"msa_update_with_pair_and_coord\.to_out\.fn\.0\.",
     r"msa_update_with_pair_and_coord.ff_ln."),
    (r"msa_update_with_pair_and_coord\.to_out\.fn\.1\.net\.0\.",
     r"msa_update_with_pair_and_coord.ff.fc1."),
    (r"msa_update_with_pair_and_coord\.to_out\.fn\.1\.net\.3\.",
     r"msa_update_with_pair_and_coord.ff.fc2."),
    # prediction head
    (r"prediction_head\.proj\.0\.", r"prediction_head.proj_ln."),
    (r"prediction_head\.proj\.1\.", r"prediction_head.proj."),
    (r"(\w+)_head\.0\.layer\.0\.", r"\1_head.proj_in."),
    (r"(\w+)_head\.0\.layer\.1\.", r"\1_head.in_in."),
    (r"(\w+)_head\.0\.layer\.(\d+)\.layer\.fn\.0\.", None),  # handled in code
    # embeddings
    (r"msa_emb\.to_embedding\.", r"msa_emb.to_embedding."),
]

_RESBLOCK_INNER = {  # ResBlock2D Sequential index -> our name
    "0": "conv1", "1": "in1", "4": "conv2", "5": "in2",
}


def _rewrite_name(name: str) -> str:
    for pat, rep in _RULES:
        new, n = re.subn(pat, rep, name)
        if n:
            name = new
            break
    # '&' marks the two_track nesting point inside three-track/final blocks:
    # the two-track submodules nest under "two_track"; coord/msa-coord/plddt
    # modules live directly in the block.
    if "&" in name:
        head, rest = name.split("&", 1)  # head ends with "two_track"
        prefix = head[: -len("two_track")]  # e.g. "three_track_0."
        if rest.startswith(_NOT_IN_TWO_TRACK):
            name = prefix + rest
        else:
            name = head + "." + rest

    # ResNet towers: block index arithmetic (blocks start at Sequential index 3)
    m = re.search(r"(\w+_head)\.0\.layer\.(\d+)\.layer\.fn\.(\d+)\.", name)
    if m and m.group(3) in _RESBLOCK_INNER:
        blk = int(m.group(2)) - 3
        name = re.sub(
            r"(\w+_head)\.0\.layer\.(\d+)\.layer\.fn\.(\d+)\.",
            rf"\1.block_{blk}.{_RESBLOCK_INNER[m.group(3)]}.",
            name,
        )
    m = re.search(r"(\w+_head)\.0\.layer\.(\d+)\.(weight|bias)$", name)
    if m and int(m.group(2)) >= 3:
        name = re.sub(
            r"(\w+_head)\.0\.layer\.(\d+)\.", r"\1.proj_out.", name
        )

    for pat, rep in _SUBRULES:
        if rep is None:
            continue
        name = re.sub(pat, rep, name)
    for pat, rep in _ENCODER:
        name = re.sub(pat, rep, name)
    return name


def _leaf_and_transform(flax_path: str, torch_leaf: str, value, target_leaf_names):
    """Decide destination leaf name + layout transform from context."""
    v = np.asarray(value)
    if torch_leaf == "weight":
        if "embedding" in target_leaf_names:
            return "embedding", v
        if "scale" in target_leaf_names:
            return "scale", v
        if v.ndim == 4:
            return "kernel", _t_conv(v)
        if v.ndim == 2 and "kernel" in target_leaf_names:
            return "kernel", _t_linear(v)
        return "kernel", v
    if torch_leaf == "bias":
        return "bias", v
    return torch_leaf, v


def import_state_dict(
    state_dict: Dict[str, Any], target_params: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Map a torch state_dict onto a copy of target_params.

    Returns (params, report) where report lists 'loaded', 'unmapped' (torch keys
    with no destination), and 'missing' (flax leaves untouched).
    """
    import copy

    params = copy.deepcopy(
        {k: v for k, v in target_params.items()}
    )
    loaded, unmapped = [], []
    loaded_dest = set()

    def get_subtree(tree, parts):
        for p in parts:
            if not isinstance(tree, dict) or p not in tree:
                return None
            tree = tree[p]
        return tree

    for tname, tval in state_dict.items():
        if tname.endswith("projection_matrix") or ".pos_enc" in tname:
            continue  # performer buffers / PE tables: constants here
        parts = _rewrite_name(tname).split(".")
        mod_parts, leaf = parts[:-1], parts[-1]
        sub = get_subtree(params, mod_parts)
        if sub is None:
            # GSE3Res direct parameters (W_d / bias_d) live one level up
            sub = get_subtree(params, parts[:-1])
        if not isinstance(sub, dict):
            unmapped.append(tname)
            continue
        if leaf in sub and not isinstance(sub[leaf], dict):
            # direct parameter (e.g. W_0, bias_1)
            v = np.asarray(tval)
            v = _squeeze0(v) if v.shape != np.asarray(sub[leaf]).shape else v
            if v.shape != np.asarray(sub[leaf]).shape:
                unmapped.append(tname)
                continue
            sub[leaf] = v.astype(np.asarray(sub[leaf]).dtype)
            loaded.append(tname)
            loaded_dest.add(".".join(parts))
            continue
        dest_leaf, v = _leaf_and_transform(
            "/".join(mod_parts), leaf, tval,
            [k for k, x in sub.items() if not isinstance(x, dict)],
        )
        if dest_leaf not in sub or v.shape != np.asarray(sub[dest_leaf]).shape:
            unmapped.append(tname)
            continue
        sub[dest_leaf] = v.astype(np.asarray(sub[dest_leaf]).dtype)
        loaded.append(tname)
        loaded_dest.add(".".join(mod_parts + [dest_leaf]))

    def leaf_paths(tree, prefix=()):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out.extend(leaf_paths(v, prefix + (k,)))
            else:
                out.append(".".join(prefix + (k,)))
        return out

    missing = sorted(p for p in leaf_paths(params) if p not in loaded_dest)
    report = {"loaded": loaded, "unmapped": unmapped, "missing": missing}
    return params, report
