#!/bin/bash
# Run Rovioli VIO over the recorded bag, producing a VI-map for the
# maplab console. Topic names match ops/maplab/create_rosbag.py output.
set -e

source "$HOME/ws/devel/setup.bash"

ROSBAG=${ROSBAG:-/home/maplab_user/bag.bag}
MAP_FOLDER=${MAP_FOLDER:-/tmp/maps/map}
SENSOR_CALIBRATION=${SENSOR_CALIBRATION:-/home/maplab_user/sensors.yaml}

mkdir -p "$(dirname $MAP_FOLDER)"

rosrun rovioli rovioli \
	--alsologtostderr=1 \
	--sensor_calibration_file="$SENSOR_CALIBRATION" \
	--datasource_type=rosbag \
	--datasource_rosbag="$ROSBAG" \
	--save_map_folder="$MAP_FOLDER" \
	--overwrite_existing_map=true \
	--optimize_map_to_localization_map=false \
	--map_builder_save_image_as_resources=false \
	--vio_camera_topic_suffix="" \
	--imu_to_camera_time_offset_ns=0
