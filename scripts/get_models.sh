#!/usr/bin/env bash
# Download the released FastVLM checkpoints (reference get_models.sh) into
# ./checkpoints, ready for fastvlm_tpu.utils.checkpoint.load_vlm (the importer
# reads the HF config.json + safetensors/bin directly — no conversion step).
#
# Stage-2 checkpoints are the pretrained bases; stage-3 are the instruction-
# tuned ones used by predict/serve.
set -euo pipefail

mkdir -p checkpoints
cd checkpoints

BASE_URL="https://ml-site.cdn-apple.com/datasets/fastvlm"
MODELS=(
  llava-fastvithd_0.5b_stage2
  llava-fastvithd_0.5b_stage3
  llava-fastvithd_1.5b_stage2
  llava-fastvithd_1.5b_stage3
  llava-fastvithd_7b_stage2
  llava-fastvithd_7b_stage3
)

for model in "${MODELS[@]}"; do
  if [ -d "$model" ]; then
    echo "$model already present, skipping"
    continue
  fi
  echo "downloading $model ..."
  wget -q --show-progress "$BASE_URL/${model}.zip"
  unzip -q "${model}.zip"
  rm -f "${model}.zip"
done

echo "done. Try:"
echo "  python -m fastvlm_tpu.predict --model-path checkpoints/llava-fastvithd_0.5b_stage3 \\"
echo "      --image-file image.jpg --prompt 'Describe the image.'"
