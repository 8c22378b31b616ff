"""Model registries — explicit dicts replacing the reference's string-``eval``
construction (``network/__init__.py:9,15``, ``arch/maggie.py:26-28``)."""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn


def _enc_res_shortcut_embed_29(args: dict) -> nn.Module:
    from .encoder import ResMaskEmbedShortCutD
    return ResMaskEmbedShortCutD(
        layers=(3, 4, 4, 2),
        num_mask=int(args.get("num_mask", 10)),
        num_embed=int(args.get("num_embed", 3)),
        lazy_os1_shortcut=bool(args.get("lazy_os1_shortcut", False)),
        lazy_os2_shortcut=bool(args.get("lazy_os2_shortcut", False)),
        s2d_stem=bool(args.get("s2d_stem", False)),
        name="encoder_mod",
    )


def _enc_res_shortcut_29(args: dict) -> nn.Module:
    from .encoder import ResShortCutD
    return ResShortCutD(layers=(3, 4, 4, 2), num_mask=int(args.get("num_mask", 1)),
                        lazy_os1_shortcut=bool(args.get("lazy_os1_shortcut", False)),
                        lazy_os2_shortcut=bool(args.get("lazy_os2_shortcut", False)),
                        s2d_stem=bool(args.get("s2d_stem", False)),
                        name="encoder_mod")


def _enc_res_encoder_29(args: dict) -> nn.Module:
    from .encoder import ResNetD
    return ResNetD(layers=(3, 4, 4, 2),
                   s2d_stem=bool(args.get("s2d_stem", False)), name="encoder_mod")


ENCODERS: dict[str, Callable[[dict], nn.Module]] = {
    "res_shortcut_embed_29": _enc_res_shortcut_embed_29,
    "res_shortcut_29": _enc_res_shortcut_29,
    "res_encoder_29": _enc_res_encoder_29,
}


def _dec_inst_matt_spconv(args: dict) -> nn.Module:
    from .decoder_sparse import ResShortCutInstMattSpconvDec
    known = {f.name for f in ResShortCutInstMattSpconvDec.__dataclass_fields__.values()} - {"name", "parent"}
    return ResShortCutInstMattSpconvDec(
        **{k: v for k, v in args.items() if k in known}, name="decoder_mod")


def _dec_res_shortcut_22(args: dict) -> nn.Module:
    from .decoder_dense import ResShortCutDec
    known = {f.name for f in ResShortCutDec.__dataclass_fields__.values()} - {"name", "parent"}
    return ResShortCutDec(**{k: v for k, v in args.items() if k in known}, name="decoder_mod")


def _dec_inst_matt_spconv_temp(args: dict) -> nn.Module:
    from .decoder_video import ResShortCutInstMattSpconvTempDec
    known = {f.name for f in ResShortCutInstMattSpconvTempDec.__dataclass_fields__.values()} - {"name", "parent"}
    return ResShortCutInstMattSpconvTempDec(
        **{k: v for k, v in args.items() if k in known}, name="decoder_mod")


def _dec_inst_matt_dense(args: dict) -> nn.Module:
    from .decoder_inst_dense import ResShortCutInstMattDec
    known = {f.name for f in ResShortCutInstMattDec.__dataclass_fields__.values()} - {"name", "parent"}
    return ResShortCutInstMattDec(**{k: v for k, v in args.items() if k in known}, name="decoder_mod")


def _dec_res_shortcut_fam_22(args: dict) -> nn.Module:
    from .decoder_fam import ResShortCutFAMDec
    known = {f.name for f in ResShortCutFAMDec.__dataclass_fields__.values()} - {"name", "parent"}
    return ResShortCutFAMDec(**{k: v for k, v in args.items() if k in known}, name="decoder_mod")


DECODERS: dict[str, Callable[[dict], nn.Module]] = {
    "res_shortcut_inst_matt_spconv_22": _dec_inst_matt_spconv,
    "res_shortcut_inst_matt_spconv_temp_22": _dec_inst_matt_spconv_temp,
    "res_shortcut_inst_matt_22": _dec_inst_matt_dense,
    "res_shortcut_22": _dec_res_shortcut_22,
    "res_shortcut_fam_22": _dec_res_shortcut_fam_22,
}


def build_encoder(name: str, args: dict) -> nn.Module:
    if name not in ENCODERS:
        raise KeyError(f"Unknown encoder '{name}'. Available: {sorted(ENCODERS)}")
    return ENCODERS[name](args)


def build_decoder(name: str, args: dict) -> nn.Module:
    if name not in DECODERS:
        raise KeyError(f"Unknown decoder '{name}'. Available: {sorted(DECODERS)}")
    return DECODERS[name](args)


def build_model(model_cfg: Any) -> nn.Module:
    """Arch registry (reference ``network/arch/__init__.py:1-5``)."""
    from .maggie import Dummy, MaGGIe
    archs = {
        "MaGGIe": MaGGIe,
        "MGM": MaGGIe,            # MGM shares the MaGGIe harness with a dense decoder
        "Dummy": Dummy,
    }
    try:
        from .maggie_temp import MaGGIeTemp
        archs["MaGGIe_Temp"] = MaGGIeTemp
    except ImportError:
        pass
    try:
        from .sparsemat import SparseMat, SparseMatSingInst
        archs["SparseMat"] = SparseMat
        archs["SparseMat_SingInst"] = SparseMatSingInst
    except ImportError:
        pass
    try:
        from .mgm_wrappers import MGMSingInst
        archs["MGM_SingInst"] = MGMSingInst
    except ImportError:
        pass
    try:
        from .tcvom import TCVOM, TCVOMSingInst
        archs["TCVOM"] = TCVOM
        archs["TCVOM_SingInst"] = TCVOMSingInst
    except ImportError:
        pass
    name = model_cfg.arch
    if name not in archs:
        raise KeyError(f"Unknown arch '{name}'. Available: {sorted(archs)}")
    return archs[name](cfg=model_cfg)
