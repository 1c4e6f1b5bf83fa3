#!/bin/bash
# Stage-1 pretraining: projector-only alignment on the plain template
# (reference: scripts/v1_5/pretrain.sh — blip_laion_cc_sbu_558k, lr 1e-3,
# everything frozen except the mm projector).  Distribution is a jax mesh
# instead of the deepspeed launcher.

python -m matryoshka_mm_tpu.train.train_mem \
    --model_name_or_path ${MODEL:-lmsys/vicuna-7b-v1.5} \
    --version plain \
    --data_path ${DATA:-./playground/data/LLaVA-Pretrain/blip_laion_cc_sbu_558k.json} \
    --image_folder ${IMAGES:-./playground/data/LLaVA-Pretrain/images} \
    --mm_projector_type mlp2x_gelu \
    --tune_mm_mlp_adapter True \
    --mm_vision_select_layer -2 \
    --bf16 True \
    --output_dir ${OUT:-./checkpoints/llava-v1.5-7b-pretrain} \
    --num_train_epochs 1 \
    --per_device_train_batch_size 32 \
    --gradient_accumulation_steps 1 \
    --learning_rate 1e-3 \
    --weight_decay 0. \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --logging_steps 1 \
    --save_steps 24000 \
    --save_total_limit 1 \
    --model_max_length 2048 \
    --tp_size ${TP:-1}
