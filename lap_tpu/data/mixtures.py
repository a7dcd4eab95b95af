"""Named dataset mixtures (parity: lihzha/lap datasets/utils/mixtures.py)."""

OXE_NAMED_MIXTURES: dict[str, list[tuple[str, float]]] = {
    "oxe_magic_soup": [
        ("fractal20220817_data", 0.54087122203),
        ("kuka", 0.8341046294),
        ("bridge_dataset", 1.0),
        ("taco_play", 2.0),
        ("jaco_play", 1.0),
        ("berkeley_cable_routing", 1.0),
        ("roboturk", 2.0),
        ("viola", 2.0),
        ("berkeley_autolab_ur5", 2.0),
        ("toto", 1.0),
        ("language_table", 0.1),
        ("stanford_hydra_dataset_converted_externally_to_rlds", 2.0),
        ("austin_buds_dataset_converted_externally_to_rlds", 1.0),
        ("furniture_bench_dataset_converted_externally_to_rlds", 0.1),
        ("bc_z", 0.2),
        ("droid", 2.0),
    ],
    "libero_finetune": [
        ("libero_10_no_noops", 1.0),
        ("libero_goal_no_noops", 1.0),
        ("libero_object_no_noops", 1.0),
        ("libero_spatial_no_noops", 1.0),
    ],
    "droid_only": [("droid", 1.0)],
    "bridge_only": [("bridge_dataset", 1.0)],
}


def get_mixture(name: str) -> list[tuple[str, float]]:
    if name in OXE_NAMED_MIXTURES:
        return OXE_NAMED_MIXTURES[name]
    # Single-dataset fallback: any registered dataset by name with weight 1.
    return [(name, 1.0)]
