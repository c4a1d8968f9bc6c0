"""CLI entry points mirroring the reference's public scripts:

  python -m otfusion_tpu.cli.train_unimodal       <-> 3D_resnet.py
  python -m otfusion_tpu.cli.train_mri_pet_ot     <-> MRI_PET_OT.py
  python -m otfusion_tpu.cli.train_ot_attn        <-> MRI_PET_OT_OT_per_epoch_attn.py
  python -m otfusion_tpu.cli.train_t1_t2_ot       <-> MRI_T1_T2_OT.py
  python -m otfusion_tpu.cli.train_mmfusion       <-> (recreated no-OT baseline)
  python -m otfusion_tpu.cli.generate_split       <-> generate_split.py
  python -m otfusion_tpu.cli.aggregate_results    <-> aggregate_pretraining_best_results.py
"""
